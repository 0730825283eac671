"""Action framework: discovery, creation, CLI argument parsing.

Re-expresses the reference's SPI plumbing in idiomatic Python:

- ``Action`` interface (``Action.java:3-5``) → an ABC with ``run()``.
- ServiceLoader discovery (``FactoryUtil.java:18-58``) → a module-level
  registry dict plus Python entry-point discovery; exactly-one-match is
  enforced the same way (``FactoryUtil.java:23-26`` →
  ``FactoryException.java:7-11``).
- ``ActionFactory.createAction`` CLI parsing (``ActionFactory.java:24-47``)
  → :func:`create_action`, including ``--help`` handling and the
  multi-value ``--var k=v`` style options
  (``ActionFactory.java:59-108``).
"""

from __future__ import annotations

import sys
from abc import ABC, abstractmethod


class FactoryError(RuntimeError):
    """Mirrors ``FactoryException.java:7-11`` — action discovery failure."""


class Action(ABC):
    """A runnable unit of work (reference: ``Action.java:3-5``)."""

    @abstractmethod
    def run(self) -> None: ...


class ActionFactory(ABC):
    """Creates an :class:`Action` from CLI args (``ActionFactory.java``)."""

    #: the first-CLI-argument name this factory answers to
    identifier: str = ""

    @abstractmethod
    def create(self, params: "MultiParams") -> Action: ...

    def show_help(self) -> None:  # pragma: no cover - overridden
        print(f"Action: {self.identifier}")


_REGISTRY: dict[str, ActionFactory] = {}


def register_factory(factory: ActionFactory) -> None:
    _REGISTRY[factory.identifier] = factory


def registered_factories() -> dict[str, ActionFactory]:
    return dict(_REGISTRY)


def discover_action_factory(name: str) -> ActionFactory:
    """Find exactly one factory for ``name``.

    Mirrors ``FactoryUtil.discoverActionFactory`` semantics
    (``FactoryUtil.java:18-58``): zero matches or ambiguous matches are
    both errors.
    """
    matches = [f for ident, f in _REGISTRY.items() if ident == name]
    if not matches:
        raise FactoryError(
            f"Could not find any factories that implement action '{name}' "
            f"in the registry. Available: {sorted(_REGISTRY)}"
        )
    if len(matches) > 1:  # pragma: no cover - dict keys are unique
        raise FactoryError(f"Multiple factories match action '{name}'.")
    return matches[0]


class MultiParams:
    """Multi-value CLI parameter access.

    The reference uses Flink's ``MultipleParameterTool``
    (``ActionFactory.java:41``) with helpers for required single values
    (``ActionFactory.java:81-84``), optional k=v config maps
    (``ActionFactory.java:69-79``) and comma-separated k=v lists
    (``ActionFactory.java:91-108``). Same surface here.
    """

    def __init__(self, args: list[str]) -> None:
        self._params: dict[str, list[str]] = {}
        key: str | None = None
        for arg in args:
            if arg.startswith("--"):
                key = arg[2:]
                self._params.setdefault(key, [])
            elif key is not None:
                self._params[key].append(arg)
            else:
                raise ValueError(f"Positional argument {arg!r} before any --option")

    def has(self, key: str) -> bool:
        return key in self._params

    def get(self, key: str) -> str | None:
        values = self._params.get(key)
        return values[-1] if values else None

    def get_required(self, key: str) -> str:
        value = self.get(key)
        if value is None:
            raise ValueError(f"Argument '--{key}' is required.")
        return value

    def get_multi(self, key: str) -> list[str]:
        return list(self._params.get(key, []))

    def optional_config_map(self, key: str) -> dict[str, str]:
        """All ``--key k=v`` occurrences folded into a dict
        (``ActionFactory.java:69-79``)."""
        out: dict[str, str] = {}
        for item in self.get_multi(key):
            parse_key_value_string(out, item)
        return out

    def comma_separated_key_values(self, key: str) -> dict[str, str]:
        """``--key k1=v1,k2=v2`` (``ActionFactory.java:91-99``)."""
        out: dict[str, str] = {}
        value = self.get(key)
        if value:
            for pair in value.split(","):
                parse_key_value_string(out, pair)
        return out


def parse_key_value_string(target: dict[str, str], kv: str) -> None:
    """Split ``k=v`` on the first ``=``, trim both sides, error on malformed
    input (``ActionFactory.java:100-108``)."""
    key, sep, value = kv.partition("=")
    if not sep or not key.strip():
        raise ValueError(f"Invalid key-value string '{kv}'. Please use format 'key=value'")
    target[key.strip()] = value.strip()


def print_global_help() -> None:
    """List discovered actions (``ActionFactory.java:49-57``)."""
    print("Usage: python -m flink_commons_spark <action> [options]")
    print("Available actions:")
    for ident in sorted(_REGISTRY):
        print(f"  {ident}")
    print("Run 'python -m flink_commons_spark <action> --help' for details.")


def create_action(args: list[str]) -> Action | None:
    """CLI front door (mirrors ``ActionFactory.createAction``,
    ``ActionFactory.java:24-47`` and ``FlinkActions.main``,
    ``FlinkActions.java:11-22``).

    Returns None when help was printed instead of creating an action.
    """
    if not args or args[0] in ("--help", "-h", "help"):
        print_global_help()
        return None
    action_name = args[0].strip().lower()
    factory = discover_action_factory(action_name)
    rest = args[1:]
    if "--help" in rest or "-h" in rest:
        factory.show_help()
        return None
    return factory.create(MultiParams(rest))


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    try:
        action = create_action(argv)
    except (FactoryError, ValueError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    if action is None:
        return 0
    action.run()
    return 0
