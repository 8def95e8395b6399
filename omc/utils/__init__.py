from omc.utils import logging  # noqa: F401
