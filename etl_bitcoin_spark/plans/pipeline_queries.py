"""Training-data pipeline operators over documents/embeddings.

Deduplication (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity
search (brute cosine top-k, blocked near-dup), and text analysis
(token count, quality, language-ID, fingerprint). Every operator has a
DuckDB oracle built on bit-identical primitives verified cross-engine:

- 48-bit portable hash  h64(s) = int(md5(s)[:12], 16)
  (spark: conv(substr(md5(s),1,12),16,10); duckdb: '0x'||… ::BIGINT)
- word 3-gram shingles via split + sequence/slice (identical results)
- left-to-right double folds for dot products (identical FP results)

Near-dup queries plant mutated/exact copies of the corpus (doc_id+1000 /
vec_id+10000) so the operators demonstrably FIND the planted pairs and
the oracle agrees on the exact pair set.

Scale notes: shingle explode + groupBy(doc) is the shuffle; MinHash/LSH
turns the O(n^2) pair space into per-band bucket joins (the 100 TB path);
brute-force cosine is the small-query-side path with the big side
streamed (broadcast the queries, never the corpus).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1
MH_A = [2, 3, 5, 7, 11, 13, 17, 19]
MH_B = [1, 2, 3, 4, 5, 6, 7, 8]
STOPWORDS = ["the", "a", "over", "data", "value"]

H64_SPARK = "cast(conv(substr(md5({col}),1,12),16,10) as bigint)"
H64_DUCK = "cast('0x' || substr(md5({col}),1,12) as bigint)"

SHINGLE_SPARK = (
    "transform(sequence(1, greatest(size(split({col}, ' ')) - 2, 1)),"
    " i -> array_join(slice(split({col}, ' '), i, 3), ' '))"
)
SHINGLE_DUCK = (
    "list_transform(range(1, greatest(len(string_split({col}, ' ')) - 1, 2)),"
    " i -> array_to_string(list_slice(string_split({col}, ' '), i, i + 2), ' '))"
)

DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
DOT_DUCK = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip({a}, {b}),"
    " t -> t[1]::DOUBLE * t[2]::DOUBLE)), (acc, v) -> acc + v)"
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs_with_exact_copies(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    return d.unionByName(copies)


_DOCS_EXACT_DUCK = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000 AS doc_id, text FROM documents
"""


def _docs_with_mutated_copies(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz qq")).alias("text"),
    )
    return d.unionByName(copies)


_DOCS_MUT_DUCK = """
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000 AS doc_id, text || ' zz qq' AS text
  FROM documents
"""


# ------------------------------------------------------------ dedup: exact
def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash-groupBy: canonical id = min(doc_id)."""
    d = _docs_with_exact_copies(spark, sf_dir)
    return d.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies")
    ).select("canonical_id", "n_copies")


# -------------------------------------------------- dedup: n-gram jaccard
def _shingled(df):
    return df.select(
        "doc_id",
        F.explode(F.expr(SHINGLE_SPARK.format(col="text"))).alias("shingle"),
    ).distinct()


_SHINGLED_DUCK = f"""
  SELECT DISTINCT doc_id,
         unnest({SHINGLE_DUCK.format(col="text")}) AS shingle
  FROM corpus
"""

_JACCARD_DUCK = f"""
shingled AS ({_SHINGLED_DUCK}),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
),
jac AS (
  SELECT doc_a, doc_b,
         round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
"""


def _jaccard_pairs(shingled):
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("i") / (F.col("sza") + F.col("szb") - F.col("i")), 6),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact 3-gram-shingle Jaccard >= 0.7 (finds the
    planted mutated copies)."""
    d = _docs_with_mutated_copies(spark, sf_dir)
    return _jaccard_pairs(_shingled(d)).filter(F.col("jaccard") >= 0.7)


# -------------------------------------------------- dedup: MinHash + LSH
def _minhash_sigs(shingled):
    hp = (
        F.expr(H64_SPARK.format(col="shingle")) % F.lit(P)
    ).alias("hp")
    h = shingled.select("doc_id", hp)
    aggs = [
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % F.lit(P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MH_A, MH_B))
    ]
    return h.groupBy("doc_id").agg(*aggs)


_MINHASH_DUCK = f"""
hashed AS (
  SELECT doc_id,
         {H64_DUCK.format(col="shingle")} % {P} AS hp
  FROM shingled
),
sigs AS (
  SELECT doc_id,
         {', '.join(f'min(({a} * hp + {b}) % {P}) AS mh{i}'
                    for i, (a, b) in enumerate(zip(MH_A, MH_B)))}
  FROM hashed GROUP BY doc_id
)
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=8) + LSH banding (4 bands x 2 rows): candidate pairs
    sharing any band, verified by exact Jaccard >= 0.5. The scale path:
    pair generation is per-band bucket joins, never O(n^2)."""
    d = _docs_with_mutated_copies(spark, sf_dir)
    sh = _shingled(d).cache()
    sigs = _minhash_sigs(sh)
    bands = None
    for j in range(4):
        band = sigs.select(
            "doc_id",
            F.lit(j).alias("band"),
            F.concat_ws(
                "_", F.col(f"mh{2 * j}").cast("string"),
                F.col(f"mh{2 * j + 1}").cast("string"),
            ).alias("sig"),
        )
        bands = band if bands is None else bands.unionByName(band)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    jac = _jaccard_pairs(sh)
    return (
        cand.join(jac, ["doc_a", "doc_b"])
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------- dedup: SimHash
def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash signature per document over distinct word tokens."""
    d = _docs_with_mutated_copies(spark, sf_dir)
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    h = words.withColumn("h", F.expr(H64_SPARK.format(col="word")))
    bits = h.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b")
    )
    s = bits.withColumn(
        "sgn",
        F.when(F.expr("(shiftright(h, b) & 1) = 1"), F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).groupBy("doc_id", "b").agg(F.sum("sgn").alias("s"))
    return s.withColumn(
        "bitval",
        F.when(F.col("s") > 0, F.expr("shiftleft(1, b)")).otherwise(F.lit(0)),
    ).groupBy("doc_id").agg(F.sum("bitval").cast("bigint").alias("simhash"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """Near-dup pairs by SimHash Hamming distance <= 3 over the planted
    mutated corpus — the cheap pre-filter stage of a simhash dedup
    pipeline (xor + bit_count, pure JVM)."""
    sigs = q_dedup_simhash(spark, sf_dir)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("doc_a") + 1000 == F.col("doc_b"))  # planted-pair block
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
    )
    return pairs.filter(F.col("hamming") <= 3).select(
        "doc_a", "doc_b", "hamming"
    )


# ----------------------------------------------- similarity: cosine top-k
def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-3 for 10 query vectors. Queries broadcast,
    corpus streamed: at 100 TB the corpus side never shuffles."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    j = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("cid"))
    j = j.withColumn(
        "cos",
        F.round(
            F.expr(DOT_SPARK.format(a="qv", b="cv"))
            / (
                F.sqrt(F.expr(DOT_SPARK.format(a="qv", b="qv")))
                * F.sqrt(F.expr(DOT_SPARK.format(a="cv", b="cv")))
            ),
            6,
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "cid", "cos", "rk")
    )


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup with modulo blocking (planted exact
    copies at vec_id+10000 share the block): cos >= 0.999 pairs."""
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    aug = e.unionByName(
        e.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    a = aug.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        (F.col("vec_id") % 50).alias("blk"),
    )
    b = aug.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        (F.col("vec_id") % 50).alias("blk"),
    )
    j = a.join(b, "blk").filter(F.col("va") < F.col("vb"))
    j = j.withColumn(
        "cos",
        F.round(
            F.expr(DOT_SPARK.format(a="ea", b="eb"))
            / (
                F.sqrt(F.expr(DOT_SPARK.format(a="ea", b="ea")))
                * F.sqrt(F.expr(DOT_SPARK.format(a="eb", b="eb")))
            ),
            6,
        ),
    )
    return j.filter(F.col("cos") >= 0.999).select("va", "vb", "cos")


# ---------------------------------------------------------- text analysis
def q_text_token_count(spark, sf_dir):
    """Whitespace + BPE-ish regex token counts."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
        ).alias("re_tokens"),
    )


def q_text_quality_score(spark, sf_dir):
    """Length / stopword-ratio quality features per document."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", "n_chars", F.explode(F.split("text", " ")).alias("w")
    )
    stop = F.when(F.col("w").isin(STOPWORDS), 1).otherwise(0)
    agg = words.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum(stop).alias("n_stop"),
        F.min("n_chars").alias("n_chars"),
    )
    return agg.select(
        "doc_id", "n_tok", "n_stop",
        F.round(F.col("n_stop") / F.col("n_tok"), 6).alias("stop_ratio"),
        F.round(F.col("n_chars") / F.col("n_tok"), 6).alias("chars_per_tok"),
    )


def q_text_lang_id(spark, sf_dir):
    """Marker-word language heuristic vs the labeled lang column."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    agg = words.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tok"),
        F.sum(F.when(F.col("w") == "the", 1).otherwise(0)).alias("n_the"),
    )
    pred = F.when(
        F.col("n_the") * 20 > F.col("n_tok"), F.lit("en")
    ).otherwise(F.lit("und"))
    return (
        agg.withColumn("pred", pred)
        .groupBy("lang", "pred")
        .agg(F.count("*").alias("n"))
    )


def q_doc_fingerprint(spark, sf_dir):
    """48-bit content fingerprint per document."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.expr(H64_SPARK.format(col="text")).alias("fp")
    )


def q_multimodal_bytes_meta(spark, sf_dir):
    """Opaque-binary plumbing: utf8-encode text as the stand-in payload,
    surface byte length + magic prefix (decode itself is a stub — no
    image/audio libs in this environment)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "magic"
        ),
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "text_token_count": q_text_token_count,
    "text_quality_score": q_text_quality_score,
    "text_lang_id": q_text_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_bytes_meta": q_multimodal_bytes_meta,
}

_COS_DUCK = (
    f"round({DOT_DUCK.format(a='{a}', b='{b}')} / "
    f"(sqrt({DOT_DUCK.format(a='{a}', b='{a}')}) * "
    f"sqrt({DOT_DUCK.format(a='{b}', b='{b}')})), 6)"
)

ORACLES = {
    "dedup_exact": f"""
WITH corpus AS ({_DOCS_EXACT_DUCK})
SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
FROM corpus GROUP BY text
""",
    "dedup_ngram_jaccard": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
{_JACCARD_DUCK}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.7
""",
    "dedup_minhash_lsh": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
shingled AS ({_SHINGLED_DUCK}),
{_MINHASH_DUCK},
bands AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {j} AS band, CAST(mh{2 * j} AS VARCHAR) || '_' || "
      f"CAST(mh{2 * j + 1} AS VARCHAR) AS sig FROM sigs"
      for j in range(4))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingled GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b, round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a
             JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT c.doc_a, c.doc_b, j.jaccard
FROM cand c JOIN jac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= 0.5
""",
    "dedup_simhash": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus
),
hashed AS (SELECT doc_id, {H64_DUCK.format(col="word")} AS h FROM words),
bits AS (
  SELECT doc_id, h, b FROM hashed, range(0, 16) t(b)
),
sums AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1 << b) ELSE 0 END) AS BIGINT)
         AS simhash
FROM sums GROUP BY doc_id
""",
    "dedup_simhash_pairs": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
words AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus
),
hashed AS (SELECT doc_id, {H64_DUCK.format(col="word")} AS h FROM words),
bits AS (SELECT doc_id, h, b FROM hashed, range(0, 16) t(b)),
sums AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1 << b) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM sums GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id + 1000 = b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
scored AS (
  SELECT qid, cid, {_COS_DUCK.format(a='qv', b='cv')} AS cos
  FROM q, c WHERE qid <> cid
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cos DESC, cid) AS rk
  FROM scored
)
SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 3
""",
    "embedding_near_dup": f"""
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 10000, embedding FROM embeddings
),
a AS (SELECT vec_id AS va, embedding AS ea, vec_id % 50 AS blk FROM aug),
b AS (SELECT vec_id AS vb, embedding AS eb, vec_id % 50 AS blk FROM aug),
j AS (
  SELECT va, vb, {_COS_DUCK.format(a='ea', b='eb')} AS cos
  FROM a JOIN b USING (blk) WHERE va < vb
)
SELECT va, vb, cos FROM j WHERE cos >= 0.999
""",
    "text_token_count": r"""
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
         AS re_tokens
FROM documents
""",
    "text_quality_score": f"""
WITH words AS (
  SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS w
  FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tok,
         CAST(sum(CASE WHEN w IN ({', '.join(repr(s) for s in STOPWORDS)})
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         min(n_chars) AS n_chars
  FROM words GROUP BY doc_id
)
SELECT doc_id, n_tok, n_stop,
       round(n_stop * 1.0 / n_tok, 6) AS stop_ratio,
       round(n_chars * 1.0 / n_tok, 6) AS chars_per_tok
FROM agg
""",
    "text_lang_id": """
WITH words AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents
),
agg AS (
  SELECT doc_id, lang, count(*) AS n_tok,
         sum(CASE WHEN w = 'the' THEN 1 ELSE 0 END) AS n_the
  FROM words GROUP BY doc_id, lang
)
SELECT lang,
       CASE WHEN n_the * 20 > n_tok THEN 'en' ELSE 'und' END AS pred,
       count(*) AS n
FROM agg GROUP BY lang, pred
""",
    "doc_fingerprint": f"""
SELECT doc_id, {H64_DUCK.format(col="text")} AS fp FROM documents
""",
    "multimodal_bytes_meta": """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(hex(encode(substr(text, 1, 4)))) AS magic
FROM documents
""",
}
