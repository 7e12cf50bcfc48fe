"""Dataflow operators: ETL core (flatten / warehouse / overwrite) and the
large-scale extension operators (dedup, similarity, text analysis,
multimodal plumbing)."""
