"""Global default configuration — the counterpart of the reference's
``JSONSchemer.configure`` / ``JSONSchemer::Configuration`` (configuration.rb:
3-31, json_schemer.rb:239-245): a process-wide defaults object consulted by
:func:`~json_schemer_spark.compile_schema` for every option the caller does
not pass explicitly. Per-call options always win.

The option surface mirrors :class:`CompiledSchema`'s keyword arguments
(this engine's names — ``dialect`` where the reference says ``meta_schema``,
``assert_formats`` where it says ``format``); defaults equal the per-call
defaults, so an untouched configuration changes nothing.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable, Optional

# The engine-wide default base URI (registry.py) — imported, not redefined,
# so an untouched Configuration really does change nothing (round-4 advice:
# a divergent literal here silently rewrote absoluteKeywordLocation for
# every compile_schema() call).
from json_schemer_spark.schema.registry import DEFAULT_BASE_URI


@dataclasses.dataclass
class Configuration:
    dialect: Any = None                       # reference: meta_schema
    base_uri: str = DEFAULT_BASE_URI
    assert_formats: bool = False              # reference: format
    formats: Optional[dict] = None
    keywords: Optional[dict] = None
    content_encodings: Optional[dict] = None
    content_media_types: Optional[dict] = None
    before_property_validation: Any = None
    after_property_validation: Any = None
    insert_property_defaults: bool = False
    property_default_resolver: Optional[Callable] = None
    ref_resolver: Optional[Callable] = None
    regexp_resolver: Optional[Callable] = None
    i18n_messages: Optional[dict] = None

    def as_options(self) -> dict[str, Any]:
        """Shallow option dict (no deep copies — resolvers/callables pass
        through untouched, unlike ``dataclasses.asdict``)."""
        return {f.name: getattr(self, f.name) for f in dataclasses.fields(self)}


_configuration = Configuration()


def configuration() -> Configuration:
    """The process-wide defaults object (reference json_schemer.rb:239-241)."""
    return _configuration


def configure(fn: Callable[[Configuration], Any]) -> Configuration:
    """Mutate the global defaults in a block-like call (reference
    json_schemer.rb:243-245)::

        configure(lambda c: setattr(c, "insert_property_defaults", True))

        # or, the decorator-free multi-line form:
        def _set(c):
            c.assert_formats = True
            c.base_uri = "app://schemas"
        configure(_set)
    """
    fn(_configuration)
    return _configuration


@contextlib.contextmanager
def configured(**overrides):
    """Scoped overrides (handy in tests — configuration_test.rb manually
    saves/restores; this does it with a context manager)."""
    saved = {k: getattr(_configuration, k) for k in overrides}
    try:
        for k, v in overrides.items():
            setattr(_configuration, k, v)
        yield _configuration
    finally:
        for k, v in saved.items():
            setattr(_configuration, k, v)
