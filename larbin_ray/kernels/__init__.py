"""Pure byte-level kernels replicating the reference (ictxiangxin/larbin)
per-record semantics.  No Ray imports here; everything is unit-testable and
usable both from the Ray Data stages and from the pure-Python oracle."""
