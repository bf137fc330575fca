"""Streaming front-ends: unbounded seed injection into the wave loop."""
