"""Sources & sinks (reference: imread/imwrite in every sample binary)."""
