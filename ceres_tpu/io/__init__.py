"""Scene I/O: OBJ loading, image output."""
