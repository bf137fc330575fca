"""Crawl-pipeline operators, each a pure DataFrame→DataFrame function."""
