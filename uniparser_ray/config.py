"""Engine-wide configuration and sentinels.

Mirrors the swap points of the reference ``GlobalConfig``
(reference: uniparser/config.py:4-64): json codec, magic rule names,
default timeout, context factory.  All values here are plain publics —
jobs may override them before building rule packs.
"""

from json import JSONDecodeError, dumps, loads


class EngineConfig:
    GLOBAL_TIMEOUT = 60
    # Errors never converted to values (reference: config.py:7)
    SYSTEM_ERRORS = (KeyboardInterrupt, OSError, SystemExit)
    JSONDecodeError = JSONDecodeError
    json_dumps = staticmethod(dumps)
    json_loads = staticmethod(loads)
    # magic rule names (reference: config.py:13-19)
    __schema__ = "__schema__"
    __request__ = "__request__"
    __result__ = "__result__"
    __object__ = "__object__"
    __encoding__ = "utf-8"
    DEFAULT_UA = "Mozilla/5.0 (uniparser-ray)"

    @staticmethod
    def init_context() -> dict:
        return {}
