"""DataFrame operators: discover, assign, spatial joins, knn, dedup,
similarity, text analysis, multimodal plumbing."""
