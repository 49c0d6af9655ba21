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
MH_A = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
        59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
        127, 131]
MH_B = list(range(1, 33))
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
def _shingle_explode(df):
    """Explode 3-gram shingles with the text split ONCE into an array
    column — the single-expression form (SHINGLE_SPARK) re-tokenizes the
    string inside every lambda invocation, turning shingling O(words^2)
    per document (measured 2.4s -> 0.8s for 530k shingles at sf0.1)."""
    return df.withColumn("__w", F.split("text", " ")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(__w) - 2, 1)),"
                " i -> array_join(slice(__w, i, 3), ' '))"
            )
        ).alias("shingle"),
    )


def _shingled(df):
    return _shingle_explode(df).distinct()


_SHINGLED_DUCK = f"""
  SELECT DISTINCT doc_id,
         unnest({SHINGLE_DUCK.format(col="text")}) AS shingle
  FROM corpus
"""

# Document-frequency ceiling for the EXACT co-shingle join: a single
# ubiquitous shingle (boilerplate, a common trigram) makes that join
# quadratic in its df — df^2 candidate rows from one group. Shingles
# above the cap carry ~no near-dup signal (idf-useless: sharing one
# tells you nothing about the pair), so they are dropped from the
# INTERSECTION counting only; per-doc set sizes (the denominator) stay
# exact, which can only LOWER a pair's estimated Jaccard — conservative
# for a >= threshold filter. The cap sits far above any real df in the
# gate corpora (max 250 at sf0.1), so the oracle gate is unaffected;
# the DuckDB oracle mirrors the cap exactly.
MAX_SHINGLE_DF = 10_000

_JACCARD_DUCK = f"""
shingled AS ({_SHINGLED_DUCK}),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingled GROUP BY doc_id),
capped AS (
  SELECT shingle FROM shingled GROUP BY shingle
  HAVING count(*) <= {MAX_SHINGLE_DF}
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingled a JOIN shingled b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN capped c ON c.shingle = a.shingle
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


def _jaccard_pairs(shingled, max_df: int = MAX_SHINGLE_DF):
    """Exact all-pairs Jaccard over the co-shingle join, with the
    ``max_df`` ceiling (see MAX_SHINGLE_DF) bounding the join's
    per-shingle fan-out to max_df^2 — the hot-shingle quadratic hazard
    is closed by construction. Set sizes remain exact (full shingle
    set); only intersection counting skips capped shingles."""
    sizes = shingled.groupBy("doc_id").agg(F.count("*").alias("sz"))
    capped = (
        shingled.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("shingle")
    )
    shingled = shingled.join(capped, "shingle")
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


def _jaccard_for_pairs(cand, docsets):
    """Exact Jaccard computed ONLY for the given candidate pairs — the
    verify stage of an LSH pipeline. r7 form (guide §2.4: remove
    shuffles outright): each side of a pair attaches its whole distinct-
    shingle SET (an array riding the signature aggregation, see
    _minhash_docsets) and the intersection is counted ROW-LOCALLY with
    array_intersect — two joins and zero aggregations, where the
    previous shingle-index form paid two probe joins PLUS a pair-keyed
    count exchange. Per-doc arrays are bounded by document length
    (shingles <= words), so the row stays bounded at any corpus scale;
    the candidate set still drives all data movement, never the
    all-co-shingle pair space. No explicit broadcast hints: the
    candidate and docset frames are both O(n_docs) at the 10^10 scale
    (hints would OOM the driver there), while at small SF AQE converts
    these joins to broadcast automatically from runtime stats."""
    da = docsets.select(
        F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"),
        F.col("__sh").alias("__sha"),
    )
    db = docsets.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"),
        F.col("__sh").alias("__shb"),
    )
    i = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn(
            "jaccard",
            F.round(i / (F.col("sza") + F.col("szb") - i), 6),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact 3-gram-shingle Jaccard >= 0.7 (finds the
    planted mutated copies)."""
    d = _docs_with_mutated_copies(spark, sf_dir)
    return _jaccard_pairs(_shingled(d)).filter(F.col("jaccard") >= 0.7)


# -------------------------------------------------- dedup: MinHash + LSH
def _minhash_docsets(shingled, n_hashes: int = 8):
    """``n_hashes`` minhash values per doc (universal-hash family over
    the portable h48), PLUS the per-doc distinct-shingle count and the
    distinct-shingle SET itself — all riding ONE aggregation (r7): the
    Jaccard denominator and the verify stage's intersection operand
    come for free with the signature groupBy, so the LSH pipeline needs
    no second pass over (and no cached copy of) the shingle index."""
    assert n_hashes <= len(MH_A)
    hp = (
        F.expr(H64_SPARK.format(col="shingle")) % F.lit(P)
    ).alias("hp")
    h = shingled.select("doc_id", "shingle", hp)
    aggs = [
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % F.lit(P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MH_A[:n_hashes], MH_B[:n_hashes]))
    ]
    aggs.append(F.count("*").alias("sz"))
    aggs.append(F.collect_set("shingle").alias("__sh"))
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
    # Repartition the DOCS by doc_id before shingling (r7, guide §8:
    # shuffle the light rows, compute on the heavy ones in place): one
    # hash partitioning by doc_id satisfies BOTH the shingle distinct
    # (doc_id is a subset of its grouping keys) and the per-doc
    # signature aggregation, so the exploded shingle index — several
    # times the corpus bytes — never crosses an exchange at all. A/B at
    # sf0.1: 2.0 s -> 1.25 s warm, identical rows.
    d = _docs_with_mutated_copies(spark, sf_dir).repartition("doc_id")
    # ONE cached relation feeds the whole pipeline (r7): signatures,
    # sizes and shingle sets ride a single aggregation (_minhash_docsets)
    # — the previous two-cache form (shingle index + signatures)
    # materialized the shingle explode twice and re-probed the index in
    # the verify stage.
    sigs = _minhash_docsets(_shingled(d)).cache()
    # One explode, not a 4-way union of selects: a union re-computes the
    # whole signature aggregation once per band (measured 4x the sig
    # cost); explode(array(...)) emits all bands from a single pass.
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            "_",
                            F.col(f"mh{2 * j}").cast("string"),
                            F.col(f"mh{2 * j + 1}").cast("string"),
                        ).alias("sig"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
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
    # Verify ONLY the LSH candidates: computing Jaccard for every
    # co-shingle pair first would re-introduce the quadratic blowup the
    # banding removed; sets and sizes ride the minhash aggregation.
    return _jaccard_for_pairs(cand, sigs).filter(
        F.col("jaccard") >= 0.5
    )


def q_dedup_minhash_lsh_tuned(spark, sf_dir):
    """The threshold-tuned LSH OPERATOR (operators.dedup.minhash_lsh_pairs)
    under an oracle gate: at threshold 0.7 with 16 hashes the S-curve
    picks (b=4, r=4) banding — the oracle reproduces exactly that
    banding plus the candidate-only Jaccard verify."""
    from ..operators.dedup import minhash_lsh_pairs, tune_bands

    assert tune_bands(16, 0.7) == (4, 4)  # pins the oracle's banding
    d = _docs_with_mutated_copies(spark, sf_dir)
    return minhash_lsh_pairs(d, threshold=0.7, n_hashes=16)


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


def _simhash32_shingle_sigs(df):
    """32-bit SimHash over distinct 3-gram shingles. Shingle features —
    not bare words — because they encode word ORDER: over a small
    vocabulary, distinct-word sets of unrelated docs overlap almost
    completely and word-simhash degenerates (measured: >50% of random
    pairs within Hamming 3 of each other at 16 bits), while shingle
    signatures separate (random-pair mean Hamming 16/32, planted
    mutated-copy mean 1.9)."""
    feats = _shingle_explode(df).select(
        "doc_id", F.col("shingle").alias("word")
    ).distinct()
    h = feats.withColumn("h", F.expr(H64_SPARK.format(col="word")))
    # One aggregation pass with 32 conditional sums — not a 32x bit
    # explode (which would shuffle 32x the feature rows).
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(32)
        ]
    )
    sig = None
    for b in range(32):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return bit_sums.select("doc_id", sig.cast("bigint").alias("simhash"))


def _simhash32_shingle_sigs_exploded(df):
    """Reference formulation of the 32-bit signature via an explicit
    bit explode — kept for the property test that pins the fast
    aggregate form above to the obviously-correct one."""
    feats = _shingle_explode(df).select(
        "doc_id", F.col("shingle").alias("word")
    ).distinct()
    h = feats.withColumn("h", F.expr(H64_SPARK.format(col="word")))
    bits = h.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b")
    )
    s = bits.withColumn(
        "sgn",
        F.when(F.expr("(shiftright(h, b) & 1) = 1"), F.lit(1)).otherwise(
            F.lit(-1)
        ),
    ).groupBy("doc_id", "b").agg(F.sum("sgn").alias("s"))
    return s.withColumn(
        "bitval",
        F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(
            F.lit(0).cast("long")
        ),
    ).groupBy("doc_id").agg(F.sum("bitval").cast("bigint").alias("simhash"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """Near-dup pairs by SimHash Hamming distance <= 3, candidates
    generated from CONTENT: the 32-bit shingle signature splits into 4
    bands of 8 bits; by pigeonhole, any pair within Hamming 3 agrees on
    at least one band, so the per-band equi-join has guaranteed recall
    while probing ~2% of the pair space (measured 8.6k candidates of
    499k pairs at sf0.01). The band join is the 100 TB path —
    bucket-sized joins, never all-pairs, never id arithmetic.
    Verify = xor + bit_count, pure JVM."""
    d = _docs_with_mutated_copies(spark, sf_dir)
    sigs = _simhash32_shingle_sigs(d)
    # explode(array(...)), not a 4-way union: one pass over the sigs
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(f"(simhash >> {8 * j}) & 255").alias("bval"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bs"),
    ).select(
        "doc_id", "simhash",
        F.col("bs.band").alias("band"), F.col("bs.bval").alias("bval"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    pairs = cand.withColumn(
        "hamming", F.expr("bit_count(ha ^ hb)").cast("int")
    )
    return pairs.filter(F.col("hamming") <= 3).select(
        "doc_a", "doc_b", "hamming"
    )


# ----------------------------------------------- similarity: cosine top-k
def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-3 for 10 query vectors. Queries broadcast,
    corpus streamed: at 100 TB the corpus side never shuffles. Each
    side's norm is computed ONCE per row before the join (r7, guide
    §1.2 per-task work): sqrt(cv.cv) per corpus row instead of per
    (query, corpus) pair — same expressions over the same values, so
    the quotient is bit-identical to the fused form."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.sqrt(
            F.expr(DOT_SPARK.format(a="embedding", b="embedding"))
        ).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        F.sqrt(
            F.expr(DOT_SPARK.format(a="embedding", b="embedding"))
        ).alias("cn"),
    )
    j = c.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("cid"))
    j = j.withColumn(
        "cos",
        F.round(
            F.expr(DOT_SPARK.format(a="qv", b="cv"))
            / (F.col("qn") * F.col("cn")),
            6,
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("qid", "cid", "cos", "rk")
    )


RHP_DIM, RHP_BITS, RHP_SEED = 64, 16, 7


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup with CONTENT-based blocking: candidates
    share a 16-bit random-hyperplane LSH bucket (identical vectors — the
    planted copies at vec_id+10000 — always collide; a near-identical
    pair at angle theta collides with prob (1 - theta/pi)^16). Exact
    cos >= 0.999 verify runs only inside buckets — per-bucket joins,
    never all-pairs, never id arithmetic."""
    from ..operators.similarity import rhp_signature

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    aug = e.unionByName(
        e.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    )
    sig = rhp_signature(aug, RHP_DIM, RHP_BITS, RHP_SEED).withColumn(
        # per-row norm, computed once instead of once per candidate
        # pair (r7) — bit-identical, see q_ann_cosine_topk
        "__n",
        F.sqrt(F.expr(DOT_SPARK.format(a="embedding", b="embedding"))),
    )
    a = sig.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        F.col("__n").alias("na"), "sig",
    )
    b = sig.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        F.col("__n").alias("nb"), "sig",
    )
    j = a.join(b, "sig").filter(F.col("va") < F.col("vb"))
    j = j.withColumn(
        "cos",
        F.round(
            F.expr(DOT_SPARK.format(a="ea", b="eb"))
            / (F.col("na") * F.col("nb")),
            6,
        ),
    )
    return j.filter(F.col("cos") >= 0.999).select("va", "vb", "cos")


def q_ann_lsh_topk(spark, sf_dir):
    """RHP-LSH ANN top-3: candidates share an 8-bit hyperplane-signature
    bucket, exact cosine rerank inside the bucket (the scale path:
    bucket joins replace the O(n*q) brute scan)."""
    from ..operators.similarity import lsh_topk

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    return lsh_topk(e, q, dim=64, k=3, n_bits=8, seed=42, round_to=6)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN top-3: 16 deterministic coarse centroids, corpus assigned
    to its nearest cell, queries probe their 2 nearest cells."""
    from ..operators.similarity import ivf_topk

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(e, q, k=3, n_centroids=16, nprobe=2, seed=42, round_to=6)


# ------------------------------------------------- curation pipeline (E2E)
def q_curation_pipeline(spark, sf_dir):
    """The end-to-end training-data curation shape in ONE plan:
    quality scoring (token + stopword stats, pure JVM array expressions
    — no explode shuffle) -> quality + language filters -> exact dedup
    (content groupBy keeps the lowest doc_id) -> per-source corpus
    stats. Two shuffles total (dedup groupBy, stats groupBy); every
    filter is pushed below them. This is the plan a 100 TB curation run
    ships — the standalone gated operators are its unit tests."""
    d = _docs(spark, sf_dir)
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text", "lang",
            "source", "n_chars",
        )
    )
    stop_arr = ", ".join(repr(s) for s in STOPWORDS)
    # split once, derive both stats from the array (r7) — same values
    scored = corpus.withColumn("__w", F.split("text", " ")).select(
        "doc_id", "text", "lang", "source",
        F.size("__w").alias("n_tok"),
        F.size(
            F.expr(f"filter(__w, w -> w IN ({stop_arr}))")
        ).alias("n_stop"),
    )
    kept = scored.filter(
        (F.col("lang") == "en")
        & (F.col("n_tok") >= 5)
        & (F.col("n_stop") * 2 <= F.col("n_tok"))
    )
    deduped = kept.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_copies"),
        F.min("source").alias("source"),
        F.min("n_tok").alias("n_tok"),
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_dups_removed"),
        F.sum("n_tok").cast("bigint").alias("sum_tok"),
    )


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


def q_text_doc_profile(spark, sf_dir):
    """Composite per-document text-analysis gate (registry budget,
    round-4: one slot covers token counting, quality scoring, lang-id,
    fingerprinting, and the multimodal byte plumbing — the five
    operators remain individually callable above). Everything is
    row-local builtin array/string expressions — NO explode, NO
    shuffle, NO join: at 100 TB this is a single narrow scan-project
    stage (the former explode+groupBy formulation shuffled one row per
    TOKEN)."""
    d = _docs(spark, sf_dir)
    stop_arr = ", ".join(repr(s) for s in STOPWORDS)
    # tokenize ONCE into an array column (r7, guide §1.2): the three
    # token statistics below previously each re-split the text inside
    # their own expression — same values, one third the split work
    d = d.withColumn("__w", F.split("text", " "))
    n_tok = F.size("__w")
    n_stop = F.size(
        F.expr(f"filter(__w, w -> w IN ({stop_arr}))")
    ).cast("long")
    n_the = F.size(F.expr("filter(__w, w -> w = 'the')"))
    pred = F.when(n_the * 20 > n_tok, F.lit("en")).otherwise(F.lit("und"))
    return d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).alias("ws_tokens"),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")
        ).alias("re_tokens"),
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
        F.round(n_stop / n_tok, 6).alias("stop_ratio"),
        F.round(F.col("n_chars") / n_tok, 6).alias("chars_per_tok"),
        "lang",
        pred.alias("pred"),
        F.expr(H64_SPARK.format(col="text")).alias("fp"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias(
            "magic"
        ),
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
    "dedup_minhash_lsh_tuned": q_dedup_minhash_lsh_tuned,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "curation_pipeline": q_curation_pipeline,
    "text_doc_profile": q_text_doc_profile,
}

_COS_DUCK = (
    f"round({DOT_DUCK.format(a='{a}', b='{b}')} / "
    f"(sqrt({DOT_DUCK.format(a='{a}', b='{a}')}) * "
    f"sqrt({DOT_DUCK.format(a='{b}', b='{b}')})), 6)"
)

# unrounded variant — used where the Spark side also ranks on the raw
# double (IVF cell assignment), which is bit-identical cross-engine
_COS_DUCK_RAW = (
    f"({DOT_DUCK.format(a='{a}', b='{b}')} / "
    f"(sqrt({DOT_DUCK.format(a='{a}', b='{a}')}) * "
    f"sqrt({DOT_DUCK.format(a='{b}', b='{b}')})))"
)


def _rhp_sig_duck(
    dim: int = RHP_DIM, n_bits: int = RHP_BITS, seed: int = RHP_SEED
) -> str:
    """The same random-hyperplane signature as
    operators.similarity.rhp_signature, as a DuckDB expression over an
    ``embedding`` column: identical seeded planes (round-tripped via
    repr), identical left-to-right double fold, so the bucket equality
    classes match bit-for-bit across engines."""
    from ..operators.similarity import _hyperplanes

    def plane_lit(p):
        return "[" + ", ".join(repr(x) for x in p) + "]::DOUBLE[]"

    return " + ".join(
        f"(CASE WHEN {DOT_DUCK.format(a='embedding', b=plane_lit(p))} > 0.0"
        f" THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(_hyperplanes(dim, n_bits, seed))
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
    "dedup_minhash_lsh_tuned": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
shingled AS ({_SHINGLED_DUCK}),
{_MINHASH_DUCK},
bands AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {j} AS band, "
      + " || '_' || ".join(
          f"CAST(mh{j * 4 + i} AS VARCHAR)" for i in range(4))
      + " AS sig FROM sigs"
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
WHERE j.jaccard >= 0.7
""",
    "dedup_simhash_pairs": f"""
WITH corpus AS ({_DOCS_MUT_DUCK}),
feats AS (
  SELECT DISTINCT doc_id,
         unnest({SHINGLE_DUCK.format(col="text")}) AS word
  FROM corpus
),
hashed AS (SELECT doc_id, {H64_DUCK.format(col="word")} AS h FROM feats),
bits AS (SELECT doc_id, h, b FROM hashed, range(0, 32) t(b)),
sums AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM sums GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
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
    "ann_lsh_topk": f"""
WITH sigs AS (
  SELECT vec_id, embedding,
         {_rhp_sig_duck(dim=64, n_bits=8, seed=42)} AS sig
  FROM embeddings
),
q AS (SELECT vec_id AS qid, embedding AS qv, sig FROM sigs WHERE vec_id < 10),
c AS (SELECT vec_id AS cid, embedding AS cv, sig FROM sigs),
scored AS (
  SELECT qid, cid, {_COS_DUCK.format(a='qv', b='cv')} AS cos
  FROM c JOIN q USING (sig) WHERE qid <> cid
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY cos DESC, cid) AS rk
  FROM scored
)
SELECT qid, cid, cos, rk FROM ranked WHERE rk <= 3
""",
    "ann_ivf_topk": f"""
WITH cents AS (
  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
  ORDER BY CAST('0x' || substr(md5(CAST(vec_id + 42 AS VARCHAR)), 1, 12)
                AS BIGINT) % 997, cent_id
  LIMIT 16
),
cassign AS (
  SELECT cid, cv, cent_id FROM (
    SELECT e.vec_id AS cid, e.embedding AS cv, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_DUCK_RAW.format(a='e.embedding', b='c.cent')} DESC,
                      c.cent_id) AS crk
    FROM embeddings e, cents c
  ) WHERE crk <= 1
),
qassign AS (
  SELECT qid, qv, cent_id FROM (
    SELECT e.vec_id AS qid, e.embedding AS qv, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS_DUCK_RAW.format(a='e.embedding', b='c.cent')} DESC,
                      c.cent_id) AS crk
    FROM embeddings e, cents c WHERE e.vec_id < 10
  ) WHERE crk <= 2
),
scored AS (
  SELECT qid, cid, {_COS_DUCK.format(a='qv', b='cv')} AS cos
  FROM cassign JOIN qassign USING (cent_id) WHERE qid <> cid
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
sigs AS (SELECT vec_id, embedding, {_rhp_sig_duck()} AS sig FROM aug),
a AS (SELECT vec_id AS va, embedding AS ea, sig FROM sigs),
b AS (SELECT vec_id AS vb, embedding AS eb, sig FROM sigs),
j AS (
  SELECT va, vb, {_COS_DUCK.format(a='ea', b='eb')} AS cos
  FROM a JOIN b USING (sig) WHERE va < vb
)
SELECT va, vb, cos FROM j WHERE cos >= 0.999
""",
    "text_doc_profile": f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
agg AS (
  SELECT doc_id, count(*) AS n_tok,
         CAST(sum(CASE WHEN w IN ({', '.join(repr(s) for s in STOPWORDS)})
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
         sum(CASE WHEN w = 'the' THEN 1 ELSE 0 END) AS n_the
  FROM words GROUP BY doc_id
)
SELECT d.doc_id,
       length(d.text) - length(replace(d.text, ' ', '')) + 1 AS ws_tokens,
       len(regexp_extract_all(d.text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
         AS re_tokens,
       a.n_tok, a.n_stop,
       round(a.n_stop * 1.0 / a.n_tok, 6) AS stop_ratio,
       round(d.n_chars * 1.0 / a.n_tok, 6) AS chars_per_tok,
       d.lang,
       CASE WHEN a.n_the * 20 > a.n_tok THEN 'en' ELSE 'und' END AS pred,
       {H64_DUCK.format(col="d.text")} AS fp,
       octet_length(encode(d.text)) AS n_bytes,
       lower(hex(encode(substr(d.text, 1, 4)))) AS magic
FROM documents d JOIN agg a USING (doc_id)
""",
    "curation_pipeline": f"""
WITH corpus AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000, text, lang, source, n_chars FROM documents
),
scored AS (
  SELECT doc_id, text, lang, source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_filter(string_split(text, ' '),
             w -> w IN ({', '.join(repr(s) for s in STOPWORDS)}))) AS n_stop
  FROM corpus
),
kept AS (
  SELECT * FROM scored
  WHERE lang = 'en' AND n_tok >= 5 AND n_stop * 2 <= n_tok
),
deduped AS (
  SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies,
         min(source) AS source, min(n_tok) AS n_tok
  FROM kept GROUP BY text
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_copies - 1) AS BIGINT) AS n_dups_removed,
       CAST(sum(n_tok) AS BIGINT) AS sum_tok
FROM deduped GROUP BY source
""",
}
