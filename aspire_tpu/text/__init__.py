from .tokenize import FeatureBatch, tokenize_doc_sents, prepare_abstracts, features_to_arrays
