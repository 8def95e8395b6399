from omc.ops import cones, eigh, linalg  # noqa: F401
