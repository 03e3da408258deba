"""Scalar-function families and LLM-pipeline function libraries.

- timeparse    — strptime→Java DateTimeFormatter translation + pandas
                 Grouper freq-alias translation (SURVEY §2.5, §2.8).
- text         — language ID, quality scoring, token counting, fingerprints.
- dedup        — exact, MinHash/LSH, SimHash, n-gram Jaccard.
- similarity   — cosine top-k ANN (brute force + LSH-bucketed).
- multimodal   — binary-payload column convention + stubbed decoders.
"""
