"""Scalar / vectorized functions: deterministic hashing, sketching
(MinHash / SimHash pandas UDFs), and text-analysis column builders."""
