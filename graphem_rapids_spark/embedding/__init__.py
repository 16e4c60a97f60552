"""Core embedding operators (reference backends/, re-expressed
Spark-first): spectral init, force-directed layout, kNN joins."""
