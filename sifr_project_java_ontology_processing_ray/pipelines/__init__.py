"""End-to-end pipelines assembled from stages."""
