"""Relational/dataflow operators beyond the reference's scalar layer:
dedup (exact, minhash-LSH, simhash, n-gram jaccard), similarity
search over embeddings, text analysis, skew-handling helpers,
checkpoint/lineage. All built on DataFrame ops; pandas UDFs only
where built-ins can't express the semantics."""
