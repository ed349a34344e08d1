"""Source adapters and test-data generators."""
