"""Model runners: jit-compiled prefill/decode execution on device."""
