from .compute import compute_embeddings  # noqa: F401
from .encoder import EncoderConfig, JaxEncoder, get_encoder  # noqa: F401
from .tokenizer import HashTokenizer, get_tokenizer  # noqa: F401
