"""Shared parse-fail semantics (the CommonParserOptions matrix).

Reference behavior (core/plugin/processor/CommonParserOptions.h:27-40 and
its use in ProcessorParseRegexNative.cpp:186-253):

* ``KeepingSourceWhenParseFail`` (default True here): failed rows keep the
  raw source value (optionally renamed); if False, failed rows are
  DISCARDED (the reference deletes the event).
* ``KeepingSourceWhenParseSucceed`` (default False): successful rows keep
  the raw source too.
* ``RenamedSourceKey``: the column name the kept raw value lands under
  (default: the source key itself).

We additionally emit a boolean ``_parse_ok`` column — the Spark-friendly
replacement for the reference's per-processor success/fail counters
(mDiscardedEventsTotal etc.) and the hook the error-routing sink uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARSE_OK = "_parse_ok"


def apply_parse_result(
    df: DataFrame,
    source_key: str,
    ok: Column,
    extracted: dict[str, Column],
    cfg: dict,
    already_masked: bool = False,
) -> DataFrame:
    """Uniform post-parse handling for every parse_* operator.

    ``extracted`` maps new column name -> Column (already typed). Values are
    nulled on failed rows. Returns the dataframe with extraction columns,
    ``_parse_ok``, and source-key retention per the config matrix.

    ``already_masked``: the extracted columns are built from an input
    masked to null on failed rows, so the per-column ``when(ok, ...)``
    wrap is skipped — the wrap would make the shared parse subtree
    CONDITIONAL, which defeats codegen subexpression elimination and
    re-evaluates it once per output column.

    Plan shape: ``ok`` + every extraction are packed into ONE struct
    column in a single projection, and the public columns are cheap
    field reads from that struct. Without the pack, each output column
    repeats the full parse expression (ok alone embeds the parse once
    per key), and when the source column is itself a derived expression
    (fixtures, chained parses) project-collapse re-inlines that
    expression into every copy — measured >64 KB of generated code in
    one ``processNext()``, which janino rejects, dropping the whole
    stage to interpreted eval. Inside the struct the parse subtrees are
    unconditional siblings, so codegen subexpression elimination emits
    the shared parse exactly once; CollapseProject keeps the pack as
    its own projection because the struct is referenced once per field
    and is not "cheap".
    """
    keep_fail = cfg.get("KeepingSourceWhenParseFail", True)
    keep_ok = cfg.get("KeepingSourceWhenParseSucceed", False)
    renamed = cfg.get("RenamedSourceKey") or source_key

    cols = dict(extracted)
    pp = "_pp_parse"
    while pp in df.columns or pp in cols:
        pp += "_"
    packed = F.struct(
        ok.alias("__ok"),
        *[c.alias(f"f{i}") for i, c in enumerate(cols.values())],
    )
    out = df.withColumn(pp, packed)
    ok = F.col(pp)["__ok"]
    for i, name in enumerate(cols):
        v = F.col(pp)[f"f{i}"]
        if name == source_key and keep_fail:
            # extraction overwrites the source column; failed rows fall
            # back to the raw value (references the pre-projection
            # column) instead of null
            out = out.withColumn(name, F.when(ok, v).otherwise(F.col(name)))
        else:
            out = out.withColumn(name, v if already_masked else F.when(ok, v))
    out = out.withColumn(PARSE_OK, ok).drop(pp)

    if source_key in cols:
        # the extraction itself overwrote the source column — the
        # reference skips the source-retention matrix in that case
        # (isSourceKeyOverwritten, e.g. processor_json.go:283, which
        # would clobber the extracted value); only the discard-on-fail
        # rule still applies
        if not keep_fail:
            out = out.filter(F.col(PARSE_OK))
        return out

    if not keep_fail:
        # reference: parse-fail + not keeping source ⇒ discard the event
        out = out.filter(F.col(PARSE_OK))
        keep_fail = keep_ok  # remaining rows are all successes
    if keep_fail and keep_ok:
        pass  # keep raw on every row
    elif keep_fail and not keep_ok:
        # keep raw only on failed rows
        out = out.withColumn(source_key, F.when(~F.col(PARSE_OK), F.col(source_key)))
    elif not keep_fail and not keep_ok:
        out = out.drop(source_key)
        renamed = None
    if renamed and renamed != source_key and source_key in out.columns:
        out = out.withColumnRenamed(source_key, renamed)
    return out


def anchored(pattern: str) -> str:
    """Full-match semantics: the reference uses boost regex_match /
    Go regexp full-match-at-[0,len) (aggregator_router.go:97-111), which
    require the WHOLE value to match. Anchor unless already anchored."""
    p = pattern
    if not p.startswith("^"):
        p = "^" + p
    if not p.endswith("$") or p.endswith("\\$"):
        p = p + "$"
    return p


_EXPR_TEMPLATE_CACHE: dict = {}


def expr_template(fn):
    """Memoize a pure Column-tree builder per (py4j gateway, call args).

    Large codegen expression trees (pb wire framing, SimHash bit packs,
    otel conversions) cost 0.5-3 s of py4j round-trips to CONSTRUCT and
    are identical for identical arguments — unresolved Column trees are
    immutable and reusable across DataFrames of the same JVM, so build
    once per gateway (a restarted JVM gets a fresh build). Arguments
    must be hashable plan parameters (strings/ints/bools), never
    DataFrames/Columns."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        key = (fn.__module__, fn.__qualname__, args,
               tuple(sorted(kwargs.items())))
        gw = _gateway_token()
        hit = _EXPR_TEMPLATE_CACHE.get(key)
        if hit is not None and hit[0] == gw:
            return hit[1]
        val = fn(*args, **kwargs)
        _EXPR_TEMPLATE_CACHE[key] = (gw, val)
        return val

    return wrapper


def _gateway_token():
    """A token that changes with every NEW py4j gateway. ``id()`` of the
    gateway is unsound — CPython can reuse a freed object's address, so
    a restarted JVM could serve stale Columns wrapping dead references.
    A uuid stamped ON the gateway object dies with it instead."""
    import uuid

    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is None:
        return None
    tok = getattr(gw, "_lcs_expr_token", None)
    if tok is None:
        tok = uuid.uuid4().hex
        gw._lcs_expr_token = tok
    return tok


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``fn`` with ``col`` bound ONCE to a lambda variable.

    Expression builders that use their input several times (a varint
    that inspects each 7-bit group, a relabel action that tests + reads
    + rewrites its label map) explode when composed: Catalyst's project
    collapse / predicate pushdown substitutes a full copy of the input
    expression per reference, so nesting multiplies plan size (measured
    1.4-1.8 MB optimized plans, codegen falling over the 64 KB method
    limit into interpreted eval of the duplicated tree). Routing the
    input through a 1-element ``transform`` makes the composed
    expression reference its input exactly once — the lambda variable
    is free to appear many times — so composition stays linear.
    """
    return F.transform(F.array(col), fn)[0]


def go_jstr(s: Column) -> Column:
    """JSON-quote a string exactly like Go's ``json.Marshal``: standard
    escaping (via the to_json(array(s)) trick — proper \\uXXXX control
    handling without a scalar to_json) plus Go's default HTML escaper
    for ``<``, ``>``, ``&``."""
    j = F.to_json(F.array(s))
    core = F.substring(j, 2, F.length(j) - 2)
    for ch, rep in (("&", r"\\u0026"), ("<", r"\\u003c"), (">", r"\\u003e")):
        core = F.regexp_replace(core, ch, rep)
    return core
