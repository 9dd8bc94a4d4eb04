"""Cross-cutting utilities: metrics, tracking, checkpointing, config IO."""
