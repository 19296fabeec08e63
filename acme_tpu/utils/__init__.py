"""Utilities: units frontend, state checkpointing, progress."""

from .units import Quantity, Unit, units, UnitError
from .checkpoint import save_state, load_state

__all__ = ["Quantity", "Unit", "units", "UnitError",
           "save_state", "load_state"]
