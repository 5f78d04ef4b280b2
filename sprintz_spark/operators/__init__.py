"""Engine operators: rollup tiers, gap-fill, series encode/decode,
dedup, similarity search, text ops, multimodal plumbing."""
