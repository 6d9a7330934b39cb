"""Import-only stand-in for acnportal.acndata (see package docstring)."""
