from . import advanced_ops, cdc_queries, pipeline_queries, reference_ops


def all_queries():
    q = {}
    q.update(reference_ops.QUERIES)
    q.update(advanced_ops.QUERIES)
    q.update(cdc_queries.QUERIES)
    q.update(pipeline_queries.QUERIES)
    return q


def all_oracles():
    o = {}
    o.update(reference_ops.ORACLES)
    o.update(advanced_ops.ORACLES)
    o.update(cdc_queries.ORACLES)
    o.update(pipeline_queries.ORACLES)
    return o
