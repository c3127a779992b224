from .readers import read_jsonl, TripleStream, dev_batches
