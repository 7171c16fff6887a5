"""Host-side utilities: histograms, timers, metrics, checkpointing,
synthetic scenes, map dumps, debug rendering."""
