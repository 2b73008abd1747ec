from .batching import PhoreGraphBatch, collate, pad_sample, pick_bucket, replicate_phore
