from .bert import BertConfig, BertModel
from .convert import params_from_hf_state_dict, params_from_hf_model
from .encoders import ConSentEncoder, BiEncoder, sentence_pool
