"""String-SQL expression backend for the PNG decode builders.

The PNG chunk/block/symbol-walk expression trees are large (tens of
thousands of nodes); building them as ``pyspark.sql.Column`` objects
pays one py4j round trip PER NODE — measured ~5-10 s of driver-side
construction per decode row (SCALING_r13.md §1, SCALING_r14.md §4),
which dominates those bench rows' wall time.  This module provides a
drop-in shim for the ``pyspark.sql.functions`` subset the builders
use that assembles the SAME expression as ONE SQL text and hands it
to Catalyst via a single ``F.expr`` call — the parse + analysis cost
is unchanged, the 10k-round-trip construction cost collapses to
Python string assembly.

Design notes:

* ``S`` nodes hold FRAGMENT TREES (nested tuples), not flat strings —
  flat concatenation would be O(n^2) in the expression size.  The
  tree is flattened once, linearly, at the conversion boundary
  (``to_sql``).
* Literal typing mirrors ``F.lit``: Python ints render bare (INT /
  BIGINT by magnitude, as the parser types them), floats carry the
  ``D`` suffix (DoubleType, matching ``F.lit(float)``), ``bytes``
  render as ``X'..'`` binary literals, ``bool`` as TRUE/FALSE.
* Lambda variables (``transform``/``aggregate``/``filter``/
  ``forall``/``exists``/``zip_with``) get fresh ``_sv<n>`` names from
  a module counter, so nested HOFs never capture each other's vars.
* Operator overloads reproduce Column semantics syntactically:
  ``%`` renders as SQL ``%`` (sign-of-dividend mod, same Catalyst
  ``Remainder`` as ``Column.__mod__``), ``/`` as SQL ``/`` (double
  division, same ``Divide``), ``&``/``|``/``~`` as AND/OR/NOT.

Activation is per-call-site: ``decode_pixels(..)`` (multimodal.py)
swaps its module-global ``F`` for :data:`SF` around the PNG branch
construction under :func:`string_backend`, then converts the final
output expressions with :func:`to_col`.  Verified byte-identical
result hashes vs the Column-built plans (SCALING_r14.md §6).
"""

from __future__ import annotations

import itertools
import threading

from pyspark.sql import functions as _realF

_lambda_counter = itertools.count()
_swap_lock = threading.Lock()


class S:
    """A SQL expression fragment (string tree + optional alias)."""

    __slots__ = ("frag", "name")

    def __init__(self, frag, name=None):
        self.frag = frag
        self.name = name

    # -- arithmetic ---------------------------------------------------
    def _bin(self, op, other, swap=False):
        o = lit(other)
        a, b = (o, self) if swap else (self, o)
        return S(("(", a.frag, op, b.frag, ")"))

    def __add__(self, other):
        return self._bin(" + ", other)

    def __radd__(self, other):
        return self._bin(" + ", other, swap=True)

    def __sub__(self, other):
        return self._bin(" - ", other)

    def __rsub__(self, other):
        return self._bin(" - ", other, swap=True)

    def __mul__(self, other):
        return self._bin(" * ", other)

    def __rmul__(self, other):
        return self._bin(" * ", other, swap=True)

    def __truediv__(self, other):
        return self._bin(" / ", other)

    def __rtruediv__(self, other):
        return self._bin(" / ", other, swap=True)

    def __mod__(self, other):
        return self._bin(" % ", other)

    def __rmod__(self, other):
        return self._bin(" % ", other, swap=True)

    def __neg__(self):
        return S(("(- ", self.frag, ")"))

    # -- comparison ---------------------------------------------------
    def __eq__(self, other):  # noqa: D105
        return self._bin(" = ", other)

    def __ne__(self, other):
        return self._bin(" != ", other)

    def __lt__(self, other):
        return self._bin(" < ", other)

    def __le__(self, other):
        return self._bin(" <= ", other)

    def __gt__(self, other):
        return self._bin(" > ", other)

    def __ge__(self, other):
        return self._bin(" >= ", other)

    __hash__ = None

    # -- boolean ------------------------------------------------------
    def __and__(self, other):
        return self._bin(" AND ", other)

    def __rand__(self, other):
        return self._bin(" AND ", other, swap=True)

    def __or__(self, other):
        return self._bin(" OR ", other)

    def __ror__(self, other):
        return self._bin(" OR ", other, swap=True)

    def __invert__(self):
        return S(("(NOT ", self.frag, ")"))

    def __bool__(self):
        raise ValueError(
            "truth value of a string-backend expression is undefined "
            "(same contract as Column)"
        )

    # -- Column methods the builders use ------------------------------
    def cast(self, t):
        return S(("CAST(", self.frag, " AS ", t, ")"))

    def try_cast(self, t):
        return S(("TRY_CAST(", self.frag, " AS ", t, ")"))

    def isin(self, *vals):
        if len(vals) == 1 and isinstance(vals[0], (list, tuple, set)):
            vals = tuple(vals[0])
        parts = ["(", self.frag, " IN ("]
        for i, v in enumerate(vals):
            if i:
                parts.append(", ")
            parts.append(lit(v).frag)
        parts.append("))")
        return S(tuple(parts))

    def between(self, lo, hi):
        return S(
            (
                "(",
                self.frag,
                " BETWEEN ",
                lit(lo).frag,
                " AND ",
                lit(hi).frag,
                ")",
            )
        )

    def alias(self, name):
        return S(self.frag, name)

    def isNull(self):
        return S(("(", self.frag, " IS NULL)"))

    def isNotNull(self):
        return S(("(", self.frag, " IS NOT NULL)"))

    def __getitem__(self, key):
        if isinstance(key, str):
            return S(("(", self.frag, ").`", key, "`"))
        return S(("(", self.frag, ")[", lit(key).frag, "]"))

    def getField(self, key):
        return self[key]


def _escape_str(v: str) -> str:
    return v.replace("\\", "\\\\").replace("'", "\\'")


def lit(v):
    """Literal with ``F.lit`` typing (see module docstring)."""
    if isinstance(v, S):
        return v
    if v is None:
        return S("NULL")
    if isinstance(v, bool):
        return S("TRUE" if v else "FALSE")
    if isinstance(v, int):
        return S(str(v))
    if isinstance(v, float):
        return S(repr(v) + "D")
    if isinstance(v, str):
        return S(("'", _escape_str(v), "'"))
    if isinstance(v, (bytes, bytearray)):
        return S(("X'", bytes(v).hex(), "'"))
    raise TypeError(f"unsupported literal type {type(v).__name__}")


def col(name: str):
    return S(("`", name, "`"))


def _fn(fname, *args):
    parts = [fname, "("]
    for i, a in enumerate(args):
        if i:
            parts.append(", ")
        parts.append(lit(a).frag)
    parts.append(")")
    return S(tuple(parts))


def _lambda(f):
    """Render a Python lambda over S vars as a SQL lambda."""
    n = f.__code__.co_argcount
    names = [f"_sv{next(_lambda_counter)}" for _ in range(n)]
    body = f(*[S(nm) for nm in names])
    head = names[0] if n == 1 else "(" + ", ".join(names) + ")"
    return S((head, " -> ", lit(body).frag))


class _Case(S):
    """``F.when`` chain: CASE WHEN .. [WHEN ..] [ELSE ..] END."""

    __slots__ = ("_whens",)

    def __init__(self, whens):
        self._whens = whens
        frag = ["CASE"]
        for c, v in whens:
            frag += [" WHEN ", c.frag, " THEN ", v.frag]
        frag.append(" END")
        super().__init__(tuple(frag))

    def when(self, cond, value):
        return _Case(self._whens + [(lit(cond), lit(value))])

    def otherwise(self, value):
        frag = ["CASE"]
        for c, v in self._whens:
            frag += [" WHEN ", c.frag, " THEN ", v.frag]
        frag += [" ELSE ", lit(value).frag, " END"]
        return S(tuple(frag))


class _SF:
    """``pyspark.sql.functions`` shim over :class:`S` fragments."""

    lit = staticmethod(lit)
    col = staticmethod(col)

    @staticmethod
    def when(cond, value):
        return _Case([(lit(cond), lit(value))])

    # higher-order functions ------------------------------------------
    @staticmethod
    def transform(arr, f):
        return S(("transform(", lit(arr).frag, ", ", _lambda(f).frag, ")"))

    @staticmethod
    def aggregate(arr, init, merge, finish=None):
        parts = [
            "aggregate(",
            lit(arr).frag,
            ", ",
            lit(init).frag,
            ", ",
            _lambda(merge).frag,
        ]
        if finish is not None:
            parts += [", ", _lambda(finish).frag]
        parts.append(")")
        return S(tuple(parts))

    @staticmethod
    def filter(arr, f):
        return S(("filter(", lit(arr).frag, ", ", _lambda(f).frag, ")"))

    @staticmethod
    def forall(arr, f):
        return S(("forall(", lit(arr).frag, ", ", _lambda(f).frag, ")"))

    @staticmethod
    def exists(arr, f):
        return S(("exists(", lit(arr).frag, ", ", _lambda(f).frag, ")"))

    @staticmethod
    def zip_with(a, b, f):
        return S(
            (
                "zip_with(",
                lit(a).frag,
                ", ",
                lit(b).frag,
                ", ",
                _lambda(f).frag,
                ")",
            )
        )

    @staticmethod
    def struct(*cols):
        parts = ["named_struct("]
        for i, c in enumerate(cols):
            c = lit(c)
            if c.name is None:
                raise ValueError(
                    "string-backend struct() requires aliased fields"
                )
            if i:
                parts.append(", ")
            parts += ["'", c.name, "', ", c.frag]
        parts.append(")")
        return S(tuple(parts))


def _make_passthrough(fname):
    def f(*args):
        return _fn(fname, *args)

    f.__name__ = fname
    return f


for _name in (
    "sequence",
    "pmod",
    "concat",
    "floor",
    "array",
    "length",
    "try_element_at",
    "substring",
    "hex",
    "unhex",
    "size",
    "element_at",
    "coalesce",
    "crc32",
    "array_join",
    "regexp_extract",
    "greatest",
    "least",
    "abs",
    "conv",
    "round",
    "encode",
    "slice",
    "flatten",
    "array_repeat",
    "sqrt",
    "shiftright",
    "shiftleft",
    "raise_error",
    "nullif",
    "char",
    "array_max",
    "array_min",
    "array_sort",
    "lpad",
    "rpad",
    "reverse",
    "upper",
    "lower",
):
    setattr(_SF, _name, staticmethod(_make_passthrough(_name)))

SF = _SF()


def to_sql(s: S) -> str:
    """Flatten a fragment tree to SQL text, linearly (explicit stack —
    the trees are deep enough to overrun Python recursion)."""
    out = []
    stack = [s.frag]
    while stack:
        f = stack.pop()
        if isinstance(f, str):
            out.append(f)
        else:
            stack.extend(reversed(f))
    return "".join(out)


def to_col(s: S):
    """Convert a fragment tree to a real Column via ONE ``F.expr``."""
    c = _realF.expr(to_sql(s))
    return c.alias(s.name) if s.name is not None else c


class string_backend:
    """Context manager: swap a module's global ``F`` for :data:`SF`
    while a builder constructs its expression, then restore.  Guarded
    by a lock — the swap mutates module state, and concurrent builds
    in other threads must not observe the shim."""

    def __init__(self, module):
        self.module = module

    def __enter__(self):
        _swap_lock.acquire()
        self._saved = self.module.F
        self.module.F = SF
        return SF

    def __exit__(self, *exc):
        self.module.F = self._saved
        _swap_lock.release()
