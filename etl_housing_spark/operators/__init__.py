"""Composite DataFrame→DataFrame operators.

The LLM-training-data-pipeline layer (SURVEY.md §2.13 / BASELINE.json north
star): deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, and
connected-components clustering with canonical survivors), similarity search
(brute-force + LSH/IVF scale paths), categorical encoding (keyword flags,
two-pass get_dummies), multimodal column plumbing (decode/feature/resize/
frame-sample), and skew-salted joins.

Every operator is a composition of built-in DataFrame ops; the only Python
in any data path is the Arrow-batched ``mapInPandas`` decode stubs in
``multimodal`` (the one place per-row logic is genuinely required).
"""
