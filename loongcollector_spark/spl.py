"""SPL front-end: compile an SPL script to DataFrame transforms.

The reference executes SPL via processor_spl on a Velox-backed engine
(core/plugin/processor/ProcessorSPL.cpp:34-154); its testable surface is
the corpus core/unittest/spl/spl.txt and SplUnittest.cpp. An SPL pipeline
IS a DataFrame expression DAG, so the compiler here is thin:

* commands: where / extend / project / project-away / project-rename /
  parse-regexp / parse-csv / parse-kv / parse-json;
* multi-branch scripts: ``.let ds = $src | ...;  $ds1;  $ds2;`` — the
  1-group-in-N-groups-out fan-out (SplUnittest.cpp TestMultiParse),
  which is exactly the routing pattern: a let-bound frame referenced by
  more than one branch is persisted once and each branch filters it;
* scalar expressions: SPL's function library is Presto-lineage, as is
  Spark SQL's, so most expressions pass through verbatim; a small rename
  table covers the spelling differences (chr→char, strpos→locate,
  VARBINARY→BINARY, ARRAY [..]→array(..)); unsupported names raise
  ``SplUnsupported`` at compile time — same posture as the reference's
  Init-time script validation (ProcessorSPL.cpp:69-87).

parse-json / parse-kv with no key list are schema-dynamic in SPL; Spark
plans need columns at compile time, so the compiler resolves the key set
with an EXHAUSTIVE distributed distinct-keys aggregation over the parsed
map column (column-pruned scan, explode(map_keys(...)) → distinct — only
the small key set ever reaches the driver). This matches the reference's
per-event key expansion (processor_json.go:75-78): a key first appearing
in the last row of a 100-TB input still gets its column. Set
``LCS_SPL_SAMPLED_KEYS=<n>`` to opt into the cheaper plan-time sampling
of n rows (spark.read.json-style inference) when the input is known to
be schema-stable.
"""

from __future__ import annotations

import contextlib
import json
import re
from dataclasses import dataclass

import pandas as pd  # noqa: F401 — pandas_udf shim type hints resolve here

from pyspark.sql import DataFrame, functions as F

SAMPLE_ROWS = 20


class SplError(ValueError):
    pass


class SplUnsupported(SplError):
    pass


_UNSUPPORTED = {
    "classify", "features",
}

_EMPTY_HLL_HEX: str | None = None


def _empty_hll_hex() -> str:
    """Hex of a serialized EMPTY datasketches HLL sketch — the value
    Presto's ``empty_approx_set()`` scalar produces (an HLL any merge
    can absorb). Spark has no scalar constructor, but its HLL family
    (``hll_sketch_agg`` / ``hll_union`` / ``hll_sketch_estimate``) uses
    the same datasketches wire format, so aggregating ZERO rows once per
    process yields the constant; the translator then inlines it as an
    ``unhex`` literal. estimate(empty) = 0, union(empty, s) = s."""
    global _EMPTY_HLL_HEX
    if _EMPTY_HLL_HEX is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise SplUnsupported(
                "empty_approx_set() needs an active SparkSession to build "
                "the empty-sketch literal")
        _EMPTY_HLL_HEX = spark.sql(
            "SELECT hex(hll_sketch_agg(col)) "
            "FROM (SELECT 1 AS col WHERE false)"
        ).first()[0]
    return _EMPTY_HLL_HEX

# Presto names with no Spark builtin, shimmed as registered UDFs
# (registered lazily on the active session by spl_run)
_SHIMMED = {"hmac_md5", "hmac_sha1", "hmac_sha256", "hmac_sha512",
            "combinations", "spooky_hash_v2_32", "spooky_hash_v2_64"}


def register_spl_shims(spark) -> None:
    """Register pandas-UDF shims for the handful of Presto scalars Spark
    lacks (SURVEY §2.4 plan): hmac_* (RFC 2104 over hashlib) and
    combinations. Arrow-batched, idempotent re-registration."""
    import hmac as _hmac
    from itertools import combinations as _comb

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    for alg in ("md5", "sha1", "sha256", "sha512"):
        def make(alg=alg):
            @pandas_udf("binary")
            def f(data: pd.Series, key: pd.Series) -> pd.Series:
                return pd.Series([
                    None if d is None or k is None
                    else _hmac.new(bytes(k), bytes(d), alg).digest()
                    for d, k in zip(data, key)
                ])
            return f
        spark.udf.register(f"hmac_{alg}", make())

    @pandas_udf(T.ArrayType(T.ArrayType(T.StringType())))
    def combos(arr: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series([
            None if a is None else [list(c) for c in _comb(list(a), int(k))]
            for a, k in zip(arr, n)
        ])

    spark.udf.register("combinations", combos)

    from .functions import spooky as _spooky

    @pandas_udf("binary")
    def spooky32(data: pd.Series) -> pd.Series:
        # Presto returns the 32-bit hash as big-endian bytes (airlift
        # SpookyHashV2, seed 0); VARBINARY in -> VARBINARY out.
        return pd.Series([
            None if d is None
            else _spooky.hash32(bytes(d), 0).to_bytes(4, "big")
            for d in data
        ])

    @pandas_udf("binary")
    def spooky64(data: pd.Series) -> pd.Series:
        return pd.Series([
            None if d is None
            else _spooky.hash64(bytes(d), 0).to_bytes(8, "big")
            for d in data
        ])

    spark.udf.register("spooky_hash_v2_32", spooky32)
    spark.udf.register("spooky_hash_v2_64", spooky64)


def _pct_fmt_to_jdk(fmt: str) -> str:
    """MySQL-style %-datetime format → JDK pattern (the SPL/Presto
    date_parse/date_format vocabulary)."""
    return (fmt.replace("%Y", "yyyy").replace("%y", "yy")
            .replace("%m", "MM").replace("%d", "dd")
            .replace("%H", "HH").replace("%h", "hh")
            .replace("%i", "mm").replace("%s", "ss")
            .replace("%f", "SSSSSS").replace("%T", "HH:mm:ss")
            .replace("%j", "DDD").replace("%p", "a"))


def _translate_expr(expr: str) -> str:
    """SPL/Presto scalar expression → Spark SQL expression string."""
    # Quoted literals are stashed behind \x00<i>\x7f sentinels for the whole
    # translation so the rename/rewrite passes only ever see code — a literal
    # like 'now() strpos(a,b)' must survive verbatim. While stashing, every
    # backslash inside a literal is doubled: SPL literals are raw (Presto:
    # backslash is a normal character) but Spark's SQL parser
    # backslash-escapes inside '...', so '\w+' must become '\\w+'.
    lits: list[str] = []

    def stash(text: str) -> str:
        lits.append(text)
        return f"\x00{len(lits) - 1}\x7f"

    def lit_val(tok: str) -> str:
        """Literal content of an argument token (sentinel or plain)."""
        tok = tok.strip()
        m = re.fullmatch("\x00(\\d+)\x7f", tok)
        if m:
            tok = lits[int(m.group(1))]
        return tok.strip("'\"")

    def rewrite(s: str, fname: str, fn):
        """Rewrite every fname(...) call: fn(args) returns the replacement
        text, or None to leave this call untouched (still scanning its
        arguments for nested calls). Scanning resumes AFTER a replacement
        (required for self-referential replacements like map_concat), so
        a call of the same function nested inside a rewritten call's
        arguments is left untranslated — it then fails loudly at Spark
        parse time rather than looping here; no corpus pipeline nests
        these."""
        pos = 0
        while True:
            found = _find_call(s[pos:], fname)
            if not found:
                return s
            st, a0, a1 = (p + pos for p in found)
            args = _split_args(s[a0:a1])
            rep = fn(args)
            if rep is None:
                pos = a0
                continue
            s = s[:st] + rep + s[a1 + 1:]
            pos = st + len(rep)

    out, i, n = "", 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch in "'\"":
            q, j, buf = ch, i + 1, ch
            while j < n:
                c2 = expr[j]
                if c2 == "\\":
                    buf += "\\\\"
                    j += 1
                    continue
                buf += c2
                j += 1
                if c2 == q:
                    break
            out += stash(buf)
            i = j
        else:
            out += ch
            i += 1

    # ARRAY [..] literal → array(..): balance the bracket
    def arr_sub(s: str) -> str:
        m = re.search(r"\bARRAY\s*\[", s, re.IGNORECASE)
        if not m:
            return s
        depth, i = 1, m.end()
        while i < len(s) and depth:
            depth += {"[": 1, "]": -1}.get(s[i], 0)
            i += 1
        inner = s[m.end():i - 1]
        return s[:m.start()] + "array(" + arr_sub(inner) + ")" + arr_sub(s[i:])

    out = arr_sub(out)
    # MAP(ARRAY..,ARRAY..) → map_from_arrays(...)
    out = re.sub(r"\bMAP\s*\(", "map_from_arrays(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bVARBINARY\b", "BINARY", out, flags=re.IGNORECASE)
    out = re.sub(r"\bVARCHAR\b", "STRING", out, flags=re.IGNORECASE)

    # Presto HLL scalar constructor → empty-sketch binary literal
    out = re.sub(r"\bempty_approx_set\s*\(\s*\)",
                 lambda m: f"unhex('{_empty_hll_hex()}')", out)
    # function spelling fixes
    for name in re.findall(r"\b([a-z_][a-z0-9_]*)\s*\(", out):
        if name in _UNSUPPORTED:
            raise SplUnsupported(f"SPL function {name!r} has no Spark analog")
    out = re.sub(r"\bchr\s*\(", "char(", out)
    out = re.sub(r"\bcodepoint\s*\(", "ascii(", out)
    out = re.sub(r"\ball_match\s*\(", "forall(", out)
    out = re.sub(r"\bany_match\s*\(", "exists(", out)
    out = re.sub(r"\bcardinality\s*\(", "size(", out)
    out = re.sub(r"\bjson_extract_scalar\s*\(", "get_json_object(", out)
    out = re.sub(r"\bjson_extract\s*\(", "get_json_object(", out)
    # json family: Spark works on JSON TEXT directly, so json_parse /
    # json_format are the identity; is_json_scalar = "does not start with
    # an object/array opener" over valid JSON text
    out = rewrite(out, "json_parse", lambda a: f"({a[0]})")
    out = rewrite(out, "json_format", lambda a: f"({a[0]})")
    out = rewrite(
        out, "is_json_scalar",
        lambda a: "(trim(" + a[0] + ") rlike "
        + stash(repr('^("|-?[0-9.]|true|false|null)')) + ")",
    )
    out = rewrite(
        out, "json_array_contains",
        lambda a: f"array_contains(from_json({a[0]}, 'array<string>'), "
        f"cast({a[1]} as string))",
    )

    # json_size(j, path): #keys of an object, #elements of an array, 0 for
    # a scalar at the path
    def json_size_fn(args):
        j, path = args[0], args[1]
        v = f"get_json_object({j}, {path})"
        return (
            f"(CASE WHEN {v} rlike '^\\\\s*\\\\{{' THEN size(json_object_keys({v}))"
            f" WHEN {v} rlike '^\\\\s*\\\\[' THEN cast(json_array_length({v}) as int)"
            f" WHEN {v} IS NULL THEN NULL ELSE 0 END)"
        )
    out = rewrite(out, "json_size", json_size_fn)
    # to_utf8(x)/from_utf8(x) == encode/decode(x, 'utf-8')
    out = re.sub(r"\bto_utf8\s*\(", "encode(", out)
    out = _append_arg(out, "encode", "'utf-8'", only_if_single=True)
    out = re.sub(r"\bfrom_utf8\s*\(", "decode__utf8(", out)
    out = _append_arg(out, "decode__utf8", "'utf-8'", only_if_single=True)
    out = out.replace("decode__utf8(", "decode(")
    # --- Presto URL family → parse_url ---
    for part, spark_part in (("host", "HOST"), ("path", "PATH"),
                             ("protocol", "PROTOCOL"),
                             ("query", "QUERY"), ("fragment", "REF")):
        fname = f"url_extract_{part}"
        while True:
            found = _find_call(out, fname)
            if not found:
                break
            st, a0, a1 = found
            inner = out[a0:a1]
            out = (out[:st]
                   + f"parse_url({inner}, {stash(repr(spark_part))})"
                   + out[a1 + 1:])
    while True:  # no PORT key in Spark's parse_url: take it off AUTHORITY
        found = _find_call(out, "url_extract_port")
        if not found:
            break
        st, a0, a1 = found
        inner = out[a0:a1]
        out = (out[:st]
               + f"try_cast(regexp_extract(parse_url({inner}, "
               + stash("'AUTHORITY'") + "), "
               + stash(r"':(\\d+)$'") + ", 1) as bigint)" + out[a1 + 1:])
    while True:  # url_extract_parameter(u, 'k') → parse_url(u,'QUERY','k')
        found = _find_call(out, "url_extract_parameter")
        if not found:
            break
        st, a0, a1 = found
        args = _split_args(out[a0:a1])
        out = (out[:st]
               + f"parse_url({args[0]}, {stash(repr('QUERY'))}, {args[1]})"
               + out[a1 + 1:])
    # --- Presto bitwise family ---
    out = re.sub(r"\bbitwise_and\s*\(", "__band__(", out)
    out = re.sub(r"\bbitwise_or\s*\(", "__bor__(", out)
    out = re.sub(r"\bbitwise_xor\s*\(", "__bxor__(", out)
    out = re.sub(r"\bbitwise_not\s*\(", "__bnot__(", out)
    for marker, op in (("__band__", "&"), ("__bor__", "|"), ("__bxor__", "^")):
        while f"{marker}(" in out:
            st, a0, a1 = _find_call(out, marker)
            a, b = _split_args(out[a0:a1])
            out = out[:st] + f"({a} {op} {b})" + out[a1 + 1:]
    while "__bnot__(" in out:
        st, a0, a1 = _find_call(out, "__bnot__")
        out = out[:st] + f"(~({out[a0:a1]}))" + out[a1 + 1:]
    # shift family: Presto bitwise_right_shift is LOGICAL, the
    # *_arithmetic spellings are arithmetic; the 3-arg forms (explicit bit
    # width) have no Spark analog
    def _shift(spark_fn, name):
        def fn(args):
            if len(args) != 2:
                raise SplUnsupported(
                    f"{name} with a bit-width operand has no Spark analog")
            return f"{spark_fn}({args[0]}, {args[1]})"
        return fn

    out = rewrite(out, "bitwise_arithmetic_shift_right",
                  _shift("shiftright", "bitwise_arithmetic_shift_right"))
    out = rewrite(out, "bitwise_right_shift_arithmetic",
                  _shift("shiftright", "bitwise_right_shift_arithmetic"))

    # the 3-arg forms treat x as a `bits`-wide unsigned value
    def logical_shift_r(args):
        if len(args) == 2:
            return f"shiftrightunsigned({args[0]}, {args[1]})"
        x, sh, bits = args[0], args[1], int(lit_val(args[2]))
        mask = (1 << bits) - 1
        return f"shiftrightunsigned(({x}) & {mask}, {sh})"

    def shift_l(args):
        if len(args) == 2:
            return f"shiftleft({args[0]}, {args[1]})"
        x, sh, bits = args[0], args[1], int(lit_val(args[2]))
        mask = (1 << bits) - 1
        return f"(shiftleft({x}, {sh}) & {mask})"

    out = rewrite(out, "bitwise_logical_shift_right", logical_shift_r)
    out = rewrite(out, "bitwise_shift_left", shift_l)
    out = re.sub(r"\bbitwise_left_shift\s*\(", "shiftleft(", out)
    out = re.sub(r"\bbitwise_right_shift\s*\(", "shiftrightunsigned(", out)

    def bit_count_fn(args):
        if len(args) == 2:
            if lit_val(args[1]) != "64":
                raise SplUnsupported("bit_count with bits != 64")
            return f"bit_count({args[0]})"
        return None
    out = rewrite(out, "bit_count", bit_count_fn)
    # --- Presto date/time family → Spark spellings ---
    # day_of_week: Presto ISO (Mon=1..Sun=7); Spark weekday() is Mon=0
    out = re.sub(r"\bday_of_week\s*\(", "__dow__(", out)
    out = re.sub(r"\bdow\s*\(", "__dow__(", out)
    while "__dow__(" in out:
        found = _find_call(out, "__dow__")
        st, a0, a1 = found
        inner = out[a0:a1]
        out = out[:st] + f"(weekday({inner}) + 1)" + out[a1 + 1:]
    out = re.sub(r"\bday_of_year\s*\(", "dayofyear(", out)
    out = re.sub(r"\bdoy\s*\(", "dayofyear(", out)
    out = re.sub(r"\bday_of_month\s*\(", "dayofmonth(", out)
    out = re.sub(r"\bweek_of_year\s*\(", "weekofyear(", out)
    out = re.sub(r"\bweek\s*\(", "weekofyear(", out)
    out = re.sub(r"\byear_of_week\s*\(", "__yow__(", out)
    out = re.sub(r"\byow\s*\(", "__yow__(", out)
    out = rewrite(out, "__yow__",
                  lambda a: f"extract(YEAROFWEEK FROM {a[0]})")
    # date_add('unit', n, ts) → timestampadd(unit, n, ts); date_diff
    # ('unit', a, b) → timestampdiff(unit, a, b) (unit literal unquoted)
    for presto, spark_fn in (("date_add", "timestampadd"),
                             ("date_diff", "timestampdiff")):
        pos = 0
        while True:
            found = _find_call(out[pos:], presto)
            if not found:
                break
            st, a0, a1 = (p + pos for p in found)
            args = _split_args(out[a0:a1])
            if len(args) != 3:
                # Spark's own 2-arg date_add(date, days) — leave it, but
                # keep scanning past this call for later translatable ones
                pos = a0
                continue
            unit = lit_val(args[0])
            out = (out[:st] + f"{spark_fn}({unit}, {args[1]}, {args[2]}"
                   + out[a1:])
            pos = st
    # date_parse / parse_datetime / date_format carry MySQL %-formats in
    # SPL; convert the format literal to a JDK pattern
    def dt_fmt(spark_fn):
        def fn(args):
            if len(args) != 2:
                return None
            fmt = lit_val(args[1])
            if "%" not in fmt:
                return None
            return (f"{spark_fn}({args[0]}, "
                    f"{stash(repr(_pct_fmt_to_jdk(fmt)))})")
        return fn

    out = rewrite(out, "date_parse", dt_fmt("to_timestamp"))
    out = rewrite(out, "parse_datetime", dt_fmt("to_timestamp"))
    out = rewrite(out, "date_format", dt_fmt("date_format"))
    out = re.sub(r"\bdate_parse\s*\(", "to_timestamp(", out)
    out = re.sub(r"\bformat_datetime\s*\(", "date_format(", out)
    out = re.sub(r"\bparse_datetime\s*\(", "to_timestamp(", out)
    out = re.sub(r"\bto_unixtime\s*\(", "unix_timestamp(", out)

    # from_unixtime: Presto returns a TIMESTAMP (Spark's returns a string)
    def from_unixtime_fn(args):
        if len(args) == 1:
            return f"timestamp_seconds({args[0]})"
        if len(args) == 2:
            return f"from_utc_timestamp(timestamp_seconds({args[0]}), {args[1]})"
        return None
    out = rewrite(out, "from_unixtime", from_unixtime_fn)
    out = re.sub(r"\bcurrent_timezone\s*\(\s*\)", "current_timezone()", out)
    out = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", out)
    out = re.sub(r"\blocaltimestamp\b", "current_timestamp()", out)
    out = re.sub(r"\bmillisecond\s*\(", "__ms__(", out)
    while "__ms__(" in out:
        found = _find_call(out, "__ms__")
        st, a0, a1 = found
        inner = out[a0:a1]
        out = (out[:st]
               + f"(cast(date_format({inner}, 'SSS') as int))" + out[a1 + 1:])
    # sha256(x)/sha512(x) → sha2(x, bits)
    for bits in (256, 512):
        out = re.sub(rf"\bsha{bits}\s*\(", f"sha2__{bits}(", out)
        out = _append_arg(out, f"sha2__{bits}", str(bits))
        out = out.replace(f"sha2__{bits}(", "sha2(")
    # --- binary / hash family ---
    out = re.sub(r"\bfrom_base64\s*\(", "unbase64(", out)
    out = re.sub(r"\bto_base64\s*\(", "base64(", out)
    out = re.sub(r"\bfrom_hex\s*\(", "unhex(", out)
    out = re.sub(r"\bto_hex\s*\(", "hex(", out)
    out = rewrite(out, "from_base",
                  lambda a: f"cast(conv({a[0]}, {a[1]}, 10) as bigint)"
                  if len(a) == 2 else None)
    out = rewrite(out, "to_base",
                  lambda a: f"lower(conv({a[0]}, 10, {a[1]}))"
                  if len(a) == 2 else None)
    # --- math specials ---
    def truncate_fn(args):
        if len(args) == 1:
            return f"(sign({args[0]}) * floor(abs({args[0]})))"
        scale = 10 ** int(lit_val(args[1]))
        return (f"(sign({args[0]}) * floor(abs({args[0]}) * {scale})"
                f" / {scale})")
    out = rewrite(out, "truncate", truncate_fn)
    out = re.sub(r"\bis_nan\s*\(", "isnan(", out)
    out = rewrite(out, "is_finite",
                  lambda a: f"(NOT isnan({a[0]}) AND abs({a[0]}) != "
                  f"cast({stash(repr('Infinity'))} as double))")
    out = rewrite(out, "is_infinite",
                  lambda a: f"(abs({a[0]}) = "
                  f"cast({stash(repr('Infinity'))} as double))")
    out = re.sub(r"\binfinity\s*\(\s*\)",
                 "cast(" + stash(repr("Infinity")) + " as double)", out)
    out = re.sub(r"\bnan\s*\(\s*\)",
                 "cast(" + stash(repr("NaN")) + " as double)", out)
    # random() → rand(); bounded random(n) is a uniform INTEGER in [0, n)
    # in Presto, while Spark's rand(n) would treat n as a SEED — rewrite
    # the bounded form explicitly.
    out = re.sub(r"\brandom\s*\(\s*\)", "rand()", out)
    out = rewrite(out, "random",
                  lambda a: f"cast(floor(rand() * ({a[0]})) as bigint)")
    # --- array family ---
    out = rewrite(out, "array_sum",
                  lambda a: f"aggregate({a[0]}, cast(0 as double), "
                  "(acc, x) -> acc + x)")
    out = rewrite(out, "array_average",
                  lambda a: f"(aggregate({a[0]}, cast(0 as double), "
                  f"(acc, x) -> acc + x) / size({a[0]}))")

    # array_normalize(a, p): divide by the p-norm (null-safe on zero norm)
    out = rewrite(
        out, "array_normalize",
        lambda a: (
            f"transform({a[0]}, __x -> __x / nullif(power(aggregate({a[0]}, "
            f"cast(0 as double), (__acc, __v) -> __acc + power(abs(__v), "
            f"{a[1]})), 1.0 / ({a[1]})), 0))"
        ) if len(a) == 2 else None,
    )

    # array_position(a, el, instance): position of the Nth occurrence
    def array_position_fn(args):
        if len(args) < 3:
            return None
        a, el, inst = args[0], args[1], args[2]
        return (
            f"coalesce(try_element_at(filter(transform({a}, (__x, __i) -> "
            f"CASE WHEN __x = {el} THEN __i + 1 END), "
            f"__p -> __p IS NOT NULL), {inst}), 0)"
        )
    out = rewrite(out, "array_position", array_position_fn)

    # width_bucket(x, bins): count of ascending bin bounds <= x
    def width_bucket_fn(args):
        if len(args) != 2:
            return None
        x, bins = args[0], args[1]
        return (f"aggregate({bins}, 0, (__acc, __b) -> "
                f"__acc + IF(({x}) >= __b, 1, 0))")
    out = rewrite(out, "width_bucket", width_bucket_fn)
    out = re.sub(r"\bzip\s*\(", "arrays_zip(", out)
    out = re.sub(r"\bcontains\s*\(", "array_contains(", out)
    # map() literal must stay map() — the MAP( rename above is for the
    # MAP(ARRAY.., ARRAY..) constructor
    out = out.replace("map_from_arrays()", "map()")
    # Presto map_concat is last-wins on duplicate keys; Spark's raises
    # under the default dedup policy — drop overlapped keys from the left
    out = rewrite(
        out, "map_concat",
        lambda a: (
            f"map_concat(map_filter({a[0]}, (k, v) -> "
            f"NOT array_contains(map_keys({a[1]}), k)), {a[1]})"
        ) if len(a) == 2 else None,
    )
    # Presto 2-arg regexp_replace deletes matches
    out = rewrite(out, "regexp_replace",
                  lambda a: f"regexp_replace({a[0]}, {a[1]}, "
                  + stash("''") + ")" if len(a) == 2 else None)
    # strpos(str, sub) → locate(sub, str): swap the args. Presto's 3-arg
    # strpos means "position of the Nth occurrence": instance 1 is the
    # 2-arg case, any other instance has no Spark analog.
    def strpos_fn(args):
        if len(args) >= 3:
            if lit_val(args[2]) != "1":
                raise SplUnsupported(
                    "strpos with instance != 1 has no Spark analog")
            args = args[:2]
        return f"locate({args[1]}, {args[0]})"
    out = rewrite(out, "strpos", strpos_fn)

    # strrpos(str, sub): LAST occurrence — emulate via reversed locate
    def strrpos_fn(args):
        if len(args) >= 3 and lit_val(args[2]) != "1":
            raise SplUnsupported(
                "strrpos with instance != 1 has no Spark analog")
        s, sub = args[0], args[1]
        probe = f"locate(reverse({sub}), reverse({s}))"
        return (f"(CASE WHEN {probe} = 0 THEN 0 ELSE "
                f"length({s}) - {probe} - length({sub}) + 2 END)")
    out = rewrite(out, "strrpos", strrpos_fn)
    # put the stashed literals back
    return re.sub("\x00(\\d+)\x7f", lambda m: lits[int(m.group(1))], out)


def _split_args(s: str) -> list[str]:
    args, depth, cur, q = [], 0, "", None
    for ch in s:
        if q:
            cur += ch
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(cur.strip())
            cur = ""
            continue
        cur += ch
    if cur.strip():
        args.append(cur.strip())
    return args


def _find_call(s: str, fname: str):
    m = re.search(rf"\b{fname}\s*\(", s)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(s) and depth:
        depth += {"(": 1, ")": -1}.get(s[i], 0)
        i += 1
    return m.start(), m.end(), i - 1  # call start, args start, args end


def _append_arg(s: str, fname: str, extra: str, only_if_single=False) -> str:
    pos = 0
    while True:
        found = _find_call(s[pos:], fname)
        if not found:
            return s
        st, a0, a1 = (p + pos for p in found)
        args = _split_args(s[a0:a1])
        if not only_if_single or len(args) == 1:
            s = s[:a1] + ", " + extra + s[a1:]
        pos = a1 + 1


def _parse_flags(body: str):
    """Leading ``-name='value'`` / ``-flag`` options of a parse-* command."""
    flags = {}
    while True:
        m = re.match(r"\s*-([a-z-]+)(?:=('[^']*'|\S+))?\s+", body)
        if not m:
            return flags, body.strip()
        val = m.group(2)
        if val is not None and val.startswith("'"):
            val = val[1:-1]
        flags[m.group(1)] = True if val is None else val
        body = body[m.end():]


def _unescape(s: str) -> str:
    return (s.replace(r"\x09", "\t").replace(r"\11", "\t")
            .replace(r"\t", "\t").replace(r"\n", "\n"))


@dataclass
class _Cmd:
    name: str
    body: str


def _compile_cmd(cmd: _Cmd):
    """One SPL command → DataFrame transform."""
    name, body = cmd.name, cmd.body

    if name == "where":
        expr = _translate_expr(body)
        return lambda df: df.filter(F.expr(expr))

    if name == "extend":
        assigns = [
            (k.strip().strip('"'), _translate_expr(v.strip()))
            for k, v in (a.split("=", 1) for a in _split_args(body))
        ]
        def run_extend(df, assigns=assigns):
            for k, v in assigns:
                df = df.withColumn(k, F.expr(v))
            return df
        return run_extend

    if name == "project":
        cols = []
        for a in _split_args(body):
            if "=" in a and not re.match(r"^[\w.\"']+$", a):
                k, v = a.split("=", 1)
                cols.append(F.expr(_translate_expr(v.strip())).alias(k.strip()))
            else:
                cols.append(F.col(a.strip().strip('"')))
        return lambda df: df.select(*cols)

    if name == "project-away":
        names = [a.strip().strip('"') for a in _split_args(body)]
        return lambda df: df.drop(*names)

    if name == "project-rename":
        pairs = [
            (k.strip().strip('"'), v.strip().strip('"'))
            for k, v in (a.split("=", 1) for a in _split_args(body))
        ]
        def run_rename(df, pairs=pairs):
            for new, old in pairs:
                df = df.withColumnRenamed(old, new)
            return df
        return run_rename

    if name == "parse-regexp":
        m = re.match(r"\s*([\w\"]+)\s*,\s*'((?:[^'\\]|\\.)*)'\s*(?:as\s+(.*))?$",
                     body, re.DOTALL)
        if not m:
            raise SplError(f"bad parse-regexp: {body!r}")
        col, rx, aliases = m.group(1).strip('"'), m.group(2), m.group(3)
        named = re.findall(r"\(\?P?<(\w+)>", rx)
        rx_plain = re.sub(r"\(\?P?<\w+>", "(", rx)
        keys = ([a.strip() for a in aliases.split(",")] if aliases else named)
        if not keys:
            raise SplError("parse-regexp needs 'as' aliases or named groups")
        def run_rx(df, col=col, rx=rx_plain, keys=keys):
            for i, k in enumerate(keys):
                df = df.withColumn(k, F.regexp_extract(F.col(col), rx, i + 1))
            return df
        return run_rx

    if name == "parse-csv":
        flags, rest = _parse_flags(body)
        m = re.match(r"([\w\"]+)\s+as\s+(.*)$", rest, re.DOTALL)
        if not m:
            raise SplError(f"bad parse-csv: {rest!r}")
        col = m.group(1).strip('"')
        keys = [a.strip() for a in m.group(2).split(",")]
        delim = _unescape(flags.get("delim", ","))
        quote = flags.get("quote")
        if quote:
            quote = _unescape(quote)
        strict = flags.get("strict", False)
        def run_csv(df, col=col, keys=keys, delim=delim, quote=quote, strict=strict):
            if quote:
                ddl = ", ".join(f"`{k}` string" for k in keys)
                parsed = F.from_csv(F.col(col), F.lit(ddl),
                                    {"sep": delim, "quote": quote})
                ok = None
                if strict:
                    # -strict with quoting: from_csv silently drops
                    # overflow fields, so count fields quote-aware —
                    # blank out quoted sections (doubled-quote escapes
                    # included), then count remaining delimiters
                    q = re.escape(quote)
                    qrx = f"{q}(?:[^{q}]|{q}{q})*{q}"
                    stripped = F.regexp_replace(F.col(col), qrx, "")
                    ok = F.size(F.split(stripped, re.escape(delim))) == len(keys)
                for k in keys:
                    v = parsed.getField(k)
                    if ok is not None:
                        v = F.when(ok, v)
                    df = df.withColumn(k, v)
                return df
            parts = F.split(F.col(col), re.escape(delim))
            n = F.size(parts)
            for i, k in enumerate(keys):
                v = F.when(n > i, F.element_at(parts, i + 1))
                if strict:
                    # -strict: field count must equal key count exactly
                    v = F.when(n == len(keys), F.element_at(parts, i + 1))
                df = df.withColumn(k, v)
            return df
        return run_csv

    if name == "parse-kv":
        flags, rest = _parse_flags(body)
        if flags.get("regexp"):
            # regex-KV mode (SplUnittest.cpp TestRegexKV): pairs are the
            # (key)(value) captures of a 2-group pattern
            m = re.match(r"([\w\"]+)\s*,\s*'((?:[^'\\]|\\.)*)'\s*$",
                         rest, re.DOTALL)
            if not m:
                raise SplError(f"bad parse-kv -regexp: {rest!r}")
            col, rx = m.group(1).strip('"'), m.group(2)

            def run_rxkv(df, col=col, rx=rx):
                mcol = F.map_from_arrays(
                    F.regexp_extract_all(F.col(col), F.lit(rx), F.lit(1)),
                    F.regexp_extract_all(F.col(col), F.lit(rx), F.lit(2)),
                )
                keys = _sample_rx_keys(df, col, rx)
                for k in keys:
                    df = df.withColumn(k, mcol.getItem(k))
                return df
            return run_rxkv
        col = rest.strip().strip('"')
        delims = flags.get("delims", "&")
        kv_sep = flags.get("kv-sep", "=")
        prefix = flags.get("prefix", "")
        delim_rx = "[" + re.escape(delims) + "]"
        def run_kv(df, col=col, delim_rx=delim_rx, kv_sep=kv_sep, prefix=prefix):
            mcol = F.str_to_map(F.col(col), F.lit(delim_rx), F.lit(re.escape(kv_sep)))
            keys = _sample_kv_keys(df, col, delim_rx, kv_sep)
            for k in keys:
                df = df.withColumn(prefix + k, mcol.getItem(k))
            return df
        return run_kv

    if name == "parse-json":
        flags, rest = _parse_flags(body)
        col = rest.strip().strip('"')
        prefix = flags.get("prefix", "")
        path = flags.get("path")
        def run_json(df, col=col, prefix=prefix, path=path):
            src = (F.get_json_object(F.col(col), path) if path else F.col(col))
            mcol = F.from_json(src, "map<string,string>")
            keys = _sample_json_keys(df, col, path)
            for k in keys:
                df = df.withColumn(prefix + k, mcol.getItem(k))
            return df
        return run_json

    raise SplUnsupported(f"SPL command {name!r} not supported")


def _sample_limit() -> int | None:
    """Opt-in plan-time sampling row count (None = exhaustive)."""
    import os

    v = os.environ.get("LCS_SPL_SAMPLED_KEYS")
    return int(v) if v else None


def _max_keys() -> int:
    """Cap on schema-dynamic key discovery (LCS_SPL_MAX_KEYS, default
    10k). A dynamic key becomes an output COLUMN, so a hostile corpus
    with millions of distinct keys would OOM the driver (and produce an
    unusable million-column frame) long before the plan failed — fail
    fast with a clear error instead."""
    import os

    return int(os.environ.get("LCS_SPL_MAX_KEYS", "10000"))


def _collect_keys(distinct_df, what: str) -> list[str]:
    cap = _max_keys()
    rows = distinct_df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise SplUnsupported(
            f"{what}: more than {cap} distinct keys discovered; a "
            f"dynamic key set this large cannot become output columns "
            f"(raise LCS_SPL_MAX_KEYS to override)")
    return sorted(r[0] for r in rows)


def _distinct_keys(df: DataFrame, map_expr, extra_filter=None) -> list[str]:
    """Resolve a schema-dynamic command's key set: exhaustive distributed
    distinct over the map column's keys (sorted for a deterministic
    column order); only the key set reaches the driver, bounded by
    ``_max_keys``. With LCS_SPL_SAMPLED_KEYS set, scans only that many
    rows instead."""
    n = _sample_limit()
    base = df.limit(n) if n else df
    kv = base.select(
        F.explode_outer(map_expr).alias("_k", "_v")
    ).filter(F.col("_k").isNotNull() & (F.col("_k") != ""))
    if extra_filter is not None:
        kv = kv.filter(extra_filter)
    return _collect_keys(kv.select("_k").distinct(), "dynamic key discovery")


def _sample_json_keys(df: DataFrame, col: str, path: str | None) -> list[str]:
    src = F.get_json_object(F.col(col), path) if path else F.col(col)
    return _distinct_keys(df, F.from_json(src, "map<string,string>"))


def _sample_rx_keys(df: DataFrame, col: str, rx: str) -> list[str]:
    """Key discovery for regex-KV mode: the distinct group-1 captures."""
    n = _sample_limit()
    base = df.limit(n) if n else df
    ks = base.select(
        F.explode_outer(
            F.regexp_extract_all(F.col(col), F.lit(rx), F.lit(1))
        ).alias("_k")
    ).filter(F.col("_k").isNotNull() & (F.col("_k") != ""))
    return _collect_keys(ks.distinct(), "regex-KV key discovery")


def _sample_kv_keys(df: DataFrame, col: str, delim_rx: str, kv_sep: str) -> list[str]:
    # null map values mark separator-less fragments str_to_map invented a
    # key for — not real keys (the sampled-era code skipped them too)
    return _distinct_keys(
        df,
        F.str_to_map(F.col(col), F.lit(delim_rx), F.lit(re.escape(kv_sep))),
        extra_filter=F.col("_v").isNotNull(),
    )


def _split_pipeline(text: str) -> list[_Cmd]:
    """'* | where a | extend b = 1' → command list (quote-aware split)."""
    parts, depth, cur, q = [], 0, "", None
    for ch in text:
        if q:
            cur += ch
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "|" and depth == 0:
            parts.append(cur.strip())
            cur = ""
            continue
        cur += ch
    parts.append(cur.strip())
    cmds = []
    for p in parts[1:]:  # parts[0] is the source ('*' or '$name')
        m = re.match(r"([a-z-]+)\s*(.*)$", p, re.DOTALL)
        if not m:
            raise SplError(f"bad command {p!r}")
        cmds.append(_Cmd(m.group(1), m.group(2).strip()))
    return cmds


def spl_run(df: DataFrame, script: str,
            _persisted: list | None = None) -> dict[str, DataFrame]:
    """Execute an SPL script against a DataFrame.

    Returns {output_name: DataFrame} — one entry per emitted branch
    (``$name;`` statements), or {"out": frame} for a bare pipeline.
    Let-bound frames used by ≥2 branches are persisted (the router
    copy-minimization analog — one upstream materialization, N branch
    filters). Long-lived sessions should use :func:`spl_run_scoped`,
    which unpersists those frames when the caller is done; bare
    ``spl_run`` leaves them to Spark's LRU eviction.
    """
    if any(n + "(" in script.replace(" ", "") for n in _SHIMMED):
        register_spl_shims(df.sparkSession)
    statements, cur, q = [], "", None
    for ch in script:
        if q:
            cur += ch
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
            cur += ch
        elif ch == ";":
            statements.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        statements.append(cur.strip())
    statements = [s for s in statements if s]
    if not statements:
        raise SplError("empty SPL script")

    bindings: dict[str, DataFrame] = {}
    use_count: dict[str, int] = {}
    outputs: dict[str, DataFrame] = {}

    # pass 1: count references to each let-binding
    for st in statements:
        for ref in re.findall(r"\$(\w+)", st):
            use_count[ref] = use_count.get(ref, 0) + 1

    def resolve(source: str) -> DataFrame:
        if source == "*":
            return df
        if source.startswith("$"):
            name = source[1:]
            if name not in bindings:
                raise SplError(f"unknown SPL binding ${name}")
            return bindings[name]
        raise SplError(f"bad SPL source {source!r}")

    for st in statements:
        if st.startswith(".let"):
            m = re.match(r"\.let\s+(\w+)\s*=\s*(.*)$", st, re.DOTALL)
            if not m:
                raise SplError(f"bad .let: {st!r}")
            name, rest = m.group(1), m.group(2).strip()
            src = rest.split("|", 1)[0].strip()
            frame = resolve(src)
            for cmd in _split_pipeline(rest):
                frame = _compile_cmd(cmd)(frame)
            if use_count.get(name, 0) >= 2:
                frame = frame.persist()
                if _persisted is not None:
                    _persisted.append(frame)
            bindings[name] = frame
        elif re.fullmatch(r"\$\w+", st):
            outputs[st[1:]] = resolve(st)
        else:  # bare pipeline
            frame = resolve(st.split("|", 1)[0].strip())
            for cmd in _split_pipeline(st):
                frame = _compile_cmd(cmd)(frame)
            # N anonymous pipelines → out, out1, out2, … (overwriting
            # 'out' would silently discard every branch but the last)
            key, i = "out", 0
            while key in outputs:
                i += 1
                key = f"out{i}"
            outputs[key] = frame
    return outputs


@contextlib.contextmanager
def spl_run_scoped(df: DataFrame, script: str):
    """spl_run with cache hygiene: yields the outputs dict, then
    unpersists every let-binding cache when the caller's block exits —
    a long-lived session never accumulates orphaned cached frames."""
    persisted: list[DataFrame] = []
    try:
        yield spl_run(df, script, _persisted=persisted)
    finally:
        for f in persisted:
            f.unpersist()
