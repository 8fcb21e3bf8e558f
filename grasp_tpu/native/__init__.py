"""Native (C++) runtime pieces, loaded via ctypes with Python fallbacks."""

from grasp_tpu.native.bindings import (  # noqa: F401
    native_available,
    write_token_file,
    TokenStore,
    BatchServer,
)
