"""Driver-side plans: the batch-iterative crawl round loop."""
