"""Relational operators: LSH banding + candidate generation, pair
verification, connected components, dedup variants, top-k/window
aggregations, ANN search, multimodal plumbing."""
