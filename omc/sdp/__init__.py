from omc.sdp import cuts, relax, shor  # noqa: F401
