"""End-to-end pipelines composed from the stage library."""
