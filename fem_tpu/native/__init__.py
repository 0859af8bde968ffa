from fem_tpu.native.emitter import NativeEmitter, native_available

__all__ = ["NativeEmitter", "native_available"]
