"""End-to-end pipelines mirroring the reference's entry points
(SURVEY §3): parks normalization (EP1), chat-QA extraction (EP2),
judged evaluation (EP3) — each a lazy DataFrame DAG."""
