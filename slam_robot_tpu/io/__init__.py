"""Host-side I/O: frame sources, recorders, device shims.

Everything here lives outside the jit boundary — the device sees only
prefetched arrays. Mirrors the reference's L0/L1 hardware layers
(video.{h,cpp}, vehicle.{h,cpp}) with record/replay as the de-facto
integration-test mechanism (SURVEY §4)."""
