"""Developer tools: tokenization visualizer, prog-syntax experiments."""
