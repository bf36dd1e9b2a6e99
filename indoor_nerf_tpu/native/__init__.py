"""Native (C++) host runtime components, exposed over ctypes."""

from indoor_nerf_tpu.native.batcher import NativeRayBatcher, native_available
