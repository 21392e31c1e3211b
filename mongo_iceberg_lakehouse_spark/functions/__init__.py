from .expr import let_
from .vectors import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "l2_norm", "let_"]
