"""Stage library: each module reinterprets one PRLib operator family."""
