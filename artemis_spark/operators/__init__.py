"""Crawl + training-data operators, all DataFrame-first."""
