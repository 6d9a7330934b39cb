"""Empty acnportal stand-in (tests only): lets the reference's
event_generation/utils modules import (they do ``import acnportal.acnsim``
at module level, event_generation.py:14) so tests can execute reference
methods that never touch acnportal — e.g. GMMsTraceGenerator._create_events
(event_generation.py:467-515), which is pure numpy/pandas/sklearn.
Any attribute access on these modules raises, so a test accidentally
reaching real acnportal functionality fails loudly instead of silently."""
