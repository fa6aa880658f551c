from ivclab_tpu.runtime import native

__all__ = ["native"]
