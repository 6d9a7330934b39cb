"""Import-only stand-in for acnportal.acnsim (see package docstring)."""
