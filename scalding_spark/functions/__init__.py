"""Scalar/extension function layer.

The reference has no built-in scalar function library — every map/filter is a
host-language lambda (SURVEY.md §2.8). This engine's scalar layer IS
``pyspark.sql.functions``; these modules add what Spark lacks:

- ``dates``       DateRange/Duration/Globifier algebra (scalding-date parity).
- ``text``        tokenization, language id, quality scoring, fingerprinting.
- ``dedup``       exact + MinHash-LSH + SimHash + n-gram-Jaccard dedup,
                  connected-components near-dup clustering.
- ``similarity``  embedding cosine top-k (brute force + LSH-bucketed ANN).
- ``sampling``    deterministic md5-range sampling: reproducible samples,
                  train/val/test splits, per-stratum fractions.
- ``multimodal``  opaque binary columns with typed metadata (decode stubs).
"""
