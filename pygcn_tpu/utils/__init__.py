from pygcn_tpu.utils.config import Config

__all__ = ["Config"]
