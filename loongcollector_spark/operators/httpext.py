"""HTTP-client extension surface — ext_basicauth / ext_request_breaker /
ext_default_encoder (plugins/extension/{basicauth,request_breaker,
default_encoder}).

In the reference these extensions wrap the Go HTTP transport:

* ``ext_basicauth`` (basicauth.go:28-57) implements ClientAuthenticator —
  every request gets ``SetBasicAuth(Username, Password)``, i.e. an
  ``Authorization: Basic base64(user:pass)`` header.
* ``ext_request_breaker`` (request_breaker.go:31-71) implements
  RequestInterceptor via streadway/handy's sliding-window circuit
  breaker: requests fail fast while the failure ratio observed over the
  trailing ``WindowInSeconds`` exceeds ``FailureRatio`` (defaults 0.10 /
  10 s, the init() values). handy's DefaultResponseValidator counts a
  response as a success iff ``status < 500``.
* ``ext_default_encoder`` (default_encoder.go:30-80) resolves ``Format``
  through ``encoder.NewEncoder`` (pkg/protocol/encoder/encoder.go:43-56):
  trim+lowercase the format, ``prometheus`` → the remote-write
  WriteRequest encoder with ``SeriesLimit``; anything else is a build
  error ("not supported encode format").

Spark mapping: the transport itself belongs to the deployment (there is
no HTTP client on an executor's data path); what IS data-path is the
per-request *decision and payload shape*, so each extension compiles to
a DataFrame transform:

* basicauth adds the constant Authorization header into a ``__headers__``
  map column on the request frame (constant per pipeline, exactly like
  the reference computes it once per client).
* request_breaker REPLAYS a request-outcome frame deterministically:
  for every request it computes the failure ratio over the outcomes
  that FINISHED in the trailing window (strictly before the request —
  the breaker can only see completed calls) with one RANGE-window
  aggregation per endpoint, then marks would-be fast-fails. Batch replay
  of breaker decisions is how you audit/capacity-plan a breaker config
  against production logs; the partition key is the endpoint, so the
  window never shuffles more than (endpoint, ts, ok) triples.
* default_encoder returns the matching payload-frame encoder.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column, DataFrame, Window, functions as F

from loongcollector_spark.operators import register


def basic_auth_header(username: str, password: str) -> str:
    """RFC 7617 header value — Go's Request.SetBasicAuth twin."""
    token = base64.b64encode(f"{username}:{password}".encode()).decode()
    return f"Basic {token}"


@register("ext_basicauth", keys={"Username", "Password"})
def ext_basicauth(cfg: dict):
    """Adds ``Authorization`` into the frame's ``__headers__`` map column
    (created if absent). The value is computed once at build time, like
    the reference's per-client RoundTripper (basicauth.go:44-57)."""
    header = F.lit(basic_auth_header(
        str(cfg.get("Username", "")), str(cfg.get("Password", ""))))

    def run(df: DataFrame) -> DataFrame:
        if "__headers__" in df.columns:
            merged = F.map_concat(
                # last-wins on key collision: filter the old entry first
                F.map_filter("__headers__", lambda k, _v: k != F.lit("Authorization")),
                F.create_map(F.lit("Authorization"), header),
            )
            return df.withColumn("__headers__", merged)
        return df.withColumn(
            "__headers__", F.create_map(F.lit("Authorization"), header))

    return run


def breaker_replay(df: DataFrame, failure_ratio: float = 0.10,
                   window_s: int = 10, endpoint_col: str = "endpoint",
                   ts_col: str = "ts", success_col: str = "ok") -> DataFrame:
    """Deterministic replay of ext_request_breaker decisions over a
    request-outcome log.

    For each request the breaker state is derived from outcomes with
    ``ts`` in ``[t - window_s, t)`` — strictly earlier microseconds, so
    simultaneous requests can't observe each other (a completed-calls
    window, matching a sliding-bucket breaker's view at decision time).
    Emits ``win_total`` / ``win_failed`` / ``fail_ratio_milli`` (integer
    ‰ — hash-stable across engines) and ``would_break`` (true when the
    observed ratio exceeds ``failure_ratio`` — the request the reference
    transport would fail fast). Empty window ⇒ ratio 0, closed breaker.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(endpoint_col)
        .orderBy(us)
        .rangeBetween(-window_s * 1_000_000, -1)
    )
    ok = F.col(success_col).cast("boolean")
    total = F.count(ok).over(w)
    failed = F.sum(F.when(~ok, 1).otherwise(0)).over(w)
    ratio_milli = F.when(
        total > 0, (failed * 1000 / total).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    return df.withColumns({
        "win_total": total.cast("bigint"),
        "win_failed": F.coalesce(failed, F.lit(0)).cast("bigint"),
        "fail_ratio_milli": ratio_milli,
        "would_break": F.when(total > 0, (failed / total) > failure_ratio)
                        .otherwise(F.lit(False)),
    })


@register("ext_request_breaker",
          keys={"FailureRatio", "WindowInSeconds", "EndpointKey", "TimeKey",
                "SuccessKey"})
def ext_request_breaker(cfg: dict):
    """Breaker-decision replay operator; defaults FailureRatio=0.10,
    WindowInSeconds=10 (request_breaker.go:64-70 init values)."""
    ratio = float(cfg.get("FailureRatio", 0.10))
    window_s = int(cfg.get("WindowInSeconds", 10))
    if window_s <= 0:
        window_s = 10  # WithWindow is only applied when > 0
    endpoint = str(cfg.get("EndpointKey", "endpoint"))
    ts = str(cfg.get("TimeKey", "ts"))
    success = str(cfg.get("SuccessKey", "ok"))

    def run(df: DataFrame) -> DataFrame:
        return breaker_replay(df, ratio, window_s, endpoint, ts, success)

    return run


def response_success(status: Column) -> Column:
    """handy's DefaultResponseValidator: success iff status < 500."""
    return status.cast("int") < 500


@register("ext_default_encoder", keys={"Format", "SeriesLimit"})
def ext_default_encoder(cfg: dict):
    """Format-dispatched payload encoder. Mirrors encoder.NewEncoder:
    the format is trimmed+lowercased; only ``prometheus`` exists in the
    reference registry (encoder.go:43-56), and unknown formats fail at
    build time with the same message."""
    fmt = str(cfg.get("Format", "")).strip().lower()
    if fmt == "prometheus":
        from loongcollector_spark.pbwire import prom_write_request_frame

        series_limit = int(cfg.get("SeriesLimit", 1000))

        def run(df: DataFrame) -> DataFrame:
            return prom_write_request_frame(df, series_limit)

        return run
    raise ValueError(f"not supported encode format: {cfg.get('Format')}")
