"""Host-side runtime: native codec bindings, staging I/O, playback."""
