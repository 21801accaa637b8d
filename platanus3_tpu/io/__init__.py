"""Host-side I/O: read parsing/packing and GFA output."""
