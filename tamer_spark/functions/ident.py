"""Safe-identifier validation for one-parse SQL fragment construction.

The r14 one-parse rewrites interpolate caller-supplied column NAMES
directly into ``selectExpr``/``F.expr`` strings. A name that needs quoting
(spaces, dots, hyphens, reserved words) parsed fine through ``F.col()``
but fails — or worse, silently resolves as a struct-field/qualified
reference for dotted names — once interpolated raw (ADVICE r14). Rather
than backtick-quote every interpolation site (fragile: several sites
legitimately pass composed expressions), the operators validate bare-name
parameters at entry so an unsafe name dies loudly with a clear message
instead of producing a misparsed plan.
"""

from __future__ import annotations

import re

_SAFE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def safe_ident(name: str, param: str = "column") -> str:
    """Return ``name`` if it can be interpolated into a SQL fragment
    verbatim; raise ``ValueError`` otherwise.

    Accepts the plain-identifier grammar (letter/underscore then
    alphanumerics/underscores). Everything else — spaces, dots, hyphens,
    backticks, quotes — is rejected: a dotted name would silently resolve
    as a struct field or qualified reference, and quoting characters could
    splice into the fragment.
    """
    if not isinstance(name, str) or not _SAFE_IDENT.match(name):
        raise ValueError(
            f"{param}={name!r} is not a plain SQL identifier "
            "([A-Za-z_][A-Za-z0-9_]*); rename the column before calling — "
            "this operator interpolates the name into SQL fragments where "
            "dotted/spaced/quoted names misparse or resolve differently"
        )
    return name
