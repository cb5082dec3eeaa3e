"""Scene model types: meshes, cameras, transforms, shading."""
