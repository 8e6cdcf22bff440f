"""End-to-end pipelines: streaming flagship run and checkpointed runner."""
