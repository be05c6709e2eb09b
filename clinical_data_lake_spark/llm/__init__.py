"""LLM-training-data pipeline operators (dedup + dup clustering,
similarity, corpus cleaning, sequence packing, multimodal).

Not in the reference (it is a clinical RWE lake); these extend the
engine per the project north star. All are DataFrame-native and
partition-first: designed so the 100 TB path is a shuffle on a bounded
key (shingle, band hash, bucket id) rather than any O(n^2) comparison.
"""
