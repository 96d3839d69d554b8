from .harness import encode_dataset, test_gl_transductive, test_network

__all__ = ["encode_dataset", "test_gl_transductive", "test_network"]
