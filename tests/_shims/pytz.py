"""Minimal pytz stand-in (tests only) so reference modules that import
pytz at module level (sustaingym/envs/evcharging/utils.py:18,30-31,
sustaingym/data/load_moer.py:18) can be imported here without the real
package. Backed by the stdlib zoneinfo database; only the names the
reference touches at import/test time are provided."""
from datetime import timezone as _timezone
from zoneinfo import ZoneInfo as _ZoneInfo

# pandas probes an installed pytz for its version at import time
# (pandas/compat/_optional.py) — any PEP-440 string satisfies it; tz
# objects handed out below are stdlib zoneinfo/timezone, which pandas
# handles natively
__version__ = "2024.1"

UTC = _timezone.utc


def timezone(name):
    if name in ("UTC", "GMT"):
        return _timezone.utc
    return _ZoneInfo(name)
