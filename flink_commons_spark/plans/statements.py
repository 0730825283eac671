"""SQL statement classification.

Re-expresses the reference's 21-variant statement classifier
(``StatementType.java:6-69``): case-insensitive DOTALL regexes matched
first-wins in declaration order. Declaration order matters — e.g. the
CREATE pattern excludes ``AS SELECT`` via a negative lookahead
(``StatementType.java:8``) so CTAS falls through to its own variant
(``StatementType.java:42``).
"""

from __future__ import annotations

import re
from enum import Enum

_FLAGS = re.IGNORECASE | re.DOTALL


class StatementType(Enum):
    """One variant per statement class the runner routes on.

    The (name, regex) pairs mirror ``StatementType.java:6-44`` exactly;
    ``classify`` mirrors ``StatementType.fromStatement``
    (``StatementType.java:62-69``).
    """

    SELECT = ("SELECT", r"^SELECT.*")
    CREATE = ("CREATE", r"^CREATE(?!.*AS SELECT).*$")
    DROP = ("DROP", r"^DROP.*")
    ALTER = ("ALTER", r"^ALTER.*")
    INSERT = ("INSERT", r"^INSERT.*")
    DESC = ("DESC", r"^DESC.*")
    DESCRIBE = ("DESCRIBE", r"^DESCRIBE.*")
    EXPLAIN = ("EXPLAIN", r"^EXPLAIN.*")
    USE = ("USE", r"^USE.*")
    SHOW = ("SHOW", r"^SHOW.*")
    LOAD = ("LOAD", r"^LOAD.*")
    UNLOAD = ("UNLOAD", r"^UNLOAD.*")
    SET = ("SET", r"^SET.*")
    UNSET = ("UNSET", r"^UNSET.*")
    RESET = ("RESET", r"^RESET.*")
    EXECUTE = ("EXECUTE", r"^EXECUTE.*")
    ADD_JAR = ("ADD_JAR", r"^ADD\s+JAR\s+\S+")
    ADD = ("ADD", r"^ADD\s+CUSTOMJAR\s+\S+")
    PRINT = ("PRINT", r"^PRINT.*")
    CTAS = ("CTAS", r"^CREATE\s.*AS\sSELECT.*$")
    UNKNOWN = ("UNKNOWN", r"^UNKNOWN.*")

    def __init__(self, type_name: str, regex: str) -> None:
        self.type_name = type_name
        self.pattern = re.compile(regex, _FLAGS)

    def match(self, statement: str) -> bool:
        return self.pattern.fullmatch(statement) is not None


def classify(statement: str) -> StatementType:
    """First-match-wins classification in declaration order.

    Mirrors ``StatementType.fromStatement`` (``StatementType.java:62-69``):
    unmatched statements fall back to ``UNKNOWN``.
    """
    for stype in StatementType:
        if stype.match(statement):
            return stype
    return StatementType.UNKNOWN
