from omc.ops import cones, linalg  # noqa: F401
