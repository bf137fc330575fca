"""Sources/sinks: the pages table (the engine's 'fetch'), seeds, state tables."""
