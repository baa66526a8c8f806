"""Behavioral analytics: survival/retention curves, event-transition
matrices, RFM segmentation.

The reference's users run these as hand-rolled Athena SQL over event
exports (aws-sdk-pandas feeds the query, the analyst writes the window
math); this packages the three canonical shapes with engine-checkable
arithmetic and 100 TB-safe plans:

- `survival_curve`: Kaplan–Meier product-limit estimator — the churn /
  retention curve with correct censoring (users still active at the
  observation cutoff are NOT counted as churned).
- `event_transitions`: first-order Markov transition matrix over
  per-entity event sequences — the user-journey graph.
- `rfm_segments`: recency/frequency/monetary rank-quintile scoring —
  the classic base segmentation, built WITHOUT a global ntile window
  (rank-based quantiles need a global order; this uses the two-phase
  prefix-sum rank so no single-partition funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def survival_curve(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    by: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival estimate S(t) per group: one row per
    distinct event time with ``by..., t, n_risk, n_events, n_censored,
    survival``.  ``event_col`` is 1 when the terminal event (churn,
    failure) was OBSERVED at ``duration_col``, 0 when the subject was
    censored then (still alive at cutoff) — the correction naive
    "fraction churned by day t" gets wrong.

    S(t) = Π_{u ≤ t} (1 − d_u / n_u) over observed-event times, with
    n_u = subjects still at risk entering time u.  Distributed shape:
    raw rows reduce to a per-(group, duration) count table in one
    map-side-combinable pass; at-risk counts and the running product
    (as exp of a running log-sum, zero-factor guarded) come from keyed
    windows over that bounded table — state is distinct durations per
    group, never subjects.

    Rows with NULL duration or event flag are excluded.
    """
    keys = list(by or [])
    d = F.col(duration_col)
    e = F.col(event_col).cast("int")
    s = df.where(d.isNotNull() & e.isNotNull())
    counts = s.groupBy(*keys, d.alias("t")).agg(
        F.sum(e).alias("n_events"),
        F.sum(F.lit(1) - e).alias("n_censored"),
    )
    w_all = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    w_cum = w_all.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_all)
    seen = F.sum(F.col("n_events") + F.col("n_censored")).over(w_cum)
    # at risk ENTERING time t: everyone not yet dead or censored before t
    n_risk = total - seen + F.col("n_events") + F.col("n_censored")
    c = counts.withColumn("n_risk", n_risk)
    factor = F.lit(1.0) - F.col("n_events") / F.col("n_risk")
    c = c.withColumn("__f", factor)
    # running product via exp(sum(ln)) with the factor==0 tail guarded:
    # once anyone's factor hits 0, survival is 0 from there on
    log_f = F.when(F.col("__f") > 0, F.log("__f")).otherwise(F.lit(0.0))
    any_zero = F.max((F.col("__f") <= 0).cast("int")).over(w_cum)
    surv = F.when(any_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_f).over(w_cum))
    )
    out = c.select(
        *keys,
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, round_to).alias("survival"),
    )
    return out.orderBy(*keys, "t")


def event_transitions(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_by: list,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: one row per observed (src, dst) pair with ``src, dst,
    n, p`` where p = P(next = dst | current = src).  The user-journey
    graph — which screens feed conversion, where error loops live.

    ``order_by`` must totally order events within a key (include a
    unique tie-break).  ONE keyed window (lead) + one pair-keyed
    aggregation; the conditional probabilities come from a src-marginal
    aggregation of the already-bounded pair table broadcast back.
    Terminal events (no successor) simply emit no pair.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(key_col).orderBy(*order)
    # NULL keys would collapse unrelated entities into ONE window
    # partition and fabricate cross-entity transitions; NULL states
    # carry no journey information — both excluded (same policy as
    # top_paths / window_funnel)
    base = df.where(F.col(key_col).isNotNull() & F.col(state_col).isNotNull())
    pairs = (
        base.select(
            F.col(state_col).alias("src"),
            F.lead(state_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = pairs.groupBy("src").agg(F.sum("n").alias("__tot"))
    return (
        pairs.join(F.broadcast(marg), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n") / F.col("__tot"), round_to).alias("p"),
        )
        .orderBy("src", "dst")
    )


def rfm_segments(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 5,
    monetary_round: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """RFM segmentation: per entity ``recency`` (days since last
    activity, vs the dataset max), ``frequency`` (activity count),
    ``monetary`` (amount sum), each scored 1..n_bins by GLOBAL rank
    (equal-population quantiles; 1 = worst, n_bins = best), plus the
    concatenated ``segment`` string ("555" = best customers).

    Rank-based scoring needs a global order, which ntile would funnel
    through one partition; instead each metric's rank is a two-phase
    prefix-sum of ones (`global_prefix_sum`) and the score is
    ``floor((rank−1)·k/n)+1`` — deterministic (ties broken by key),
    identical in the SQL oracle, and bounded by partition size at any
    scale.  Three ranking passes over the ALREADY-REDUCED per-entity
    table (one row per customer), never the raw activity.
    """
    from .sampling import global_prefix_sum

    k = F.col(key_col)
    ts = F.col(ts_col)
    base = df.where(k.isNotNull() & ts.isNotNull())
    ref = base.agg(F.max(ts).alias("__ref"))
    per = (
        base.crossJoin(F.broadcast(ref))  # ref is ONE row
        .groupBy(k.alias("key"))
        .agg(
            F.datediff(F.max("__ref"), F.max(ts)).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(amount_col).alias("monetary"),
        )
    )
    if monetary_round is not None:
        # rounding BEFORE ranking: a float sum's last ulp can differ
        # between engines/partitionings, which would flip the rank of
        # two near-equal customers; rounded values tie instead, and
        # ties break deterministically on the key
        per = per.withColumn("monetary", F.round("monetary", monetary_round))
    # entity count drives the score formula; per is one row per entity,
    # so this job is bounded by entity cardinality
    n_rows = per.count()
    if n_rows == 0:
        raise ValueError("rfm_segments: no non-null (key, ts) rows to segment")

    def score(frame: DataFrame, metric, ascending_is_good: bool, out: str) -> DataFrame:
        order = (
            [F.col(metric).desc(), F.col("key").asc()]
            if not ascending_is_good
            else [F.col(metric).asc(), F.col("key").asc()]
        )
        ranked = global_prefix_sum(
            frame.withColumn("__one", F.lit(1)),
            "__one",
            order,
            out_col="__rank",
            num_partitions=num_partitions,
        )
        sc = (
            F.floor((F.col("__rank") - 1) * F.lit(n_bins) / F.lit(n_rows)) + 1
        ).cast("int")
        return ranked.withColumn(out, sc).drop("__one", "__rank")

    # recency: SMALL is good -> order desc so most-stale ranks first (score 1)
    out = score(per, "recency", ascending_is_good=False, out="r_score")
    out = score(out, "frequency", ascending_is_good=True, out="f_score")
    out = score(out, "monetary", ascending_is_good=True, out="m_score")
    return out.select(
        F.col("key").alias(key_col),
        "recency",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("segment"),
    )


def top_paths(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_by: list,
    max_len: int = 5,
    top_k: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Most-traveled user journeys: per entity, the first ``max_len``
    events in order form a path string ("view>click>purchase"); paths
    are counted corpus-wide and the ``top_k`` returned with ``path,
    n_keys, share``.  The complement of `event_transitions`: the
    matrix says where single steps lead, this says which WHOLE routes
    dominate — the funnel-design input.

    Scale shape: a keyed row_number caps each entity to its FIRST
    ``max_len`` events BEFORE anything is collected (so a bot entity
    with 10⁸ events never materializes a 10⁸-element aggregation
    buffer — the window and the collection share the same key
    partitioning, one effective shuffle); the capped events collapse
    to one path string per entity, path counting is a second
    map-side-combinable aggregation on the path-cardinality-bounded
    result, and top-k is TakeOrderedAndProject.  ``order_by`` needs a
    unique tie-break for a deterministic path per entity.
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    key = F.col(key_col)
    st = F.col(state_col)
    base = df.where(key.isNotNull() & st.isNotNull()).select(
        key.alias("__k"), F.struct(*order, st.alias("__s")).alias("__e")
    )
    wcap = Window.partitionBy("__k").orderBy(F.col("__e").asc())
    capped = (
        base.withColumn("__rn", F.row_number().over(wcap))
        .where(F.col("__rn") <= max_len)
        .drop("__rn")
    )
    per = capped.groupBy("__k").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list("__e")), lambda s: s["__s"]
            ),
        ).alias("path")
    )
    tot = per.agg(F.count(F.lit(1)).alias("__t"))
    return (
        per.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .crossJoin(F.broadcast(tot))  # ONE row
        .select(
            "path",
            "n_keys",
            F.round(F.col("n_keys") / F.col("__t"), round_to).alias("share"),
        )
        .orderBy(F.col("n_keys").desc(), F.col("path").asc())
        .limit(top_k)
    )


def window_funnel(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    state_col: str,
    steps: list,
    window_seconds: float,
    max_events: int = 10_000,
    order_by: list | None = None,
) -> DataFrame:
    """Time-constrained funnel depth (ClickHouse ``windowFunnel``
    semantics): per entity, the deepest prefix of ``steps`` completed
    IN ORDER with the whole chain inside ``window_seconds`` of its
    step-1 event.  Returns ``key, level`` (0 = never hit step 1) —
    unlike the plain `events_funnel` conditional-min shape, a user who
    signs up Monday and converts in March does NOT count here.

    Algorithm (the standard greedy, exact for "does a chain exist"):
    events sorted per entity; a step-1 event (re)opens a chain with
    itself as start — keeping the LATEST start maximizes room for
    later steps; a step-j event extends level j−1's chain when it
    falls within the window of that chain's start.  One keyed
    aggregation collects ``(ts, step)`` pairs (non-step events are
    filtered BEFORE collection, and ``max_events`` caps pathological
    entities on the earliest events); the DP is a pure-JVM array fold,
    O(steps) state.
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps for a funnel")
    k = len(steps)
    key = F.col(key_col)
    st = F.col(state_col)
    t = F.col(ts_col).cast("timestamp").cast("double")
    step_idx = F.lit(None).cast("int")
    for i in range(k - 1, -1, -1):
        step_idx = F.when(st == F.lit(steps[i]), F.lit(i)).otherwise(step_idx)
    order_cols = [F.col(c) for c in (order_by or [])]
    base = df.where(key.isNotNull() & step_idx.isNotNull() & t.isNotNull()).select(
        key.alias("__k"),
        F.struct(t.alias("_t"), *[c.alias(f"_o{i}") for i, c in enumerate(order_cols)],
                 step_idx.alias("_s")).alias("__e"),
    )
    # cap BEFORE collecting: the row_number window and the aggregation
    # share the key partitioning, so a bot entity with 10^8 step events
    # never materializes a 10^8-element aggregation buffer
    wcap = Window.partitionBy("__k").orderBy(F.col("__e").asc())
    capped = (
        base.withColumn("__rn", F.row_number().over(wcap))
        .where(F.col("__rn") <= max_events)
        .drop("__rn")
    )
    per = capped.groupBy("__k").agg(
        F.array_sort(F.collect_list("__e")).alias("__es")
    )
    # DP state: array of k chain-start times (NULL = level unreached)
    zero = F.array(*[F.lit(None).cast("double") for _ in range(k)])

    def _step(acc, e):
        return F.transform(
            acc,
            lambda start, i: F.when(
                (e["_s"] == 0) & (i == 0), e["_t"]  # (re)open: latest start wins
            ).otherwise(
                # F.get is 0-based and NULL-safe out of range (i-1 = -1 at
                # level 0), unlike element_at which raises on index 0
                F.when(
                    (e["_s"] == i)
                    & (i > 0)
                    & F.get(acc, i - 1).isNotNull()
                    & (e["_t"] - F.get(acc, i - 1) <= F.lit(float(window_seconds))),
                    F.get(acc, i - 1),  # extend: chain start propagates
                ).otherwise(start)
            ),
        )

    state = F.aggregate(F.col("__es"), zero, _step)
    level = F.aggregate(
        F.transform(state, lambda s, i: F.when(s.isNotNull(), i + 1).otherwise(0)),
        F.lit(0),
        lambda a, x: F.greatest(a, x),
    )
    return per.select(F.col("__k").alias(key_col), level.alias("level"))


def rolling_active_users(
    df: DataFrame,
    *,
    ts_col: str,
    user_col: str,
    windows: list[int] = (1, 7, 28),
) -> DataFrame:
    """DAU/WAU/MAU in one pass: for EVERY calendar day in the data's
    span (dead days included, as zeros), the count of DISTINCT users
    active in the trailing w days, for each requested window — the
    canonical engagement report and the denominators for stickiness
    ratios (DAU/MAU).

    Scale shape: raw events first dedupe to (day, user) pairs (bounded
    by users × active days — the volume collapse); each pair then
    CONTRIBUTES FORWARD to the max(window) report days it can keep the
    user active for — ONE explode of the deduped table, with every
    window's count read off the same pass as a conditional
    countDistinct (one shuffle for all windows, not one per window);
    finally the full day grid left-joins the counts so gaps read as 0,
    never as missing rows or NULLs.
    """
    ws = sorted(set(int(w) for w in windows))
    if not ws or ws[0] < 1:
        raise ValueError("windows must be positive integers")
    mx = ws[-1]
    d = F.col(ts_col).cast("date")
    u = F.col(user_col)
    du = (
        df.where(d.isNotNull() & u.isNotNull())
        .select(d.alias("__d"), u.alias("__u"))
        .distinct()
    )
    span = du.agg(F.min("__d").alias("__lo"), F.max("__d").alias("__hi"))
    contrib = du.select(
        "__d",
        "__u",
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), mx - 1))
        ).alias("day"),
    )
    per = (
        contrib.crossJoin(F.broadcast(span))  # ONE row
        .where((F.col("day") >= F.col("__lo")) & (F.col("day") <= F.col("__hi")))
        .groupBy("day")
        .agg(
            *[
                F.countDistinct(
                    F.when(F.datediff(F.col("day"), F.col("__d")) < w, F.col("__u"))
                ).alias(f"active_{w}d")
                for w in ws
            ]
        )
    )
    grid = span.select(
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day")
    )
    out = grid.join(per, "day", "left")
    for w in ws:
        out = out.withColumn(
            f"active_{w}d", F.coalesce(F.col(f"active_{w}d"), F.lit(0))
        )
    return out.orderBy("day")


def cohort_ltv(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    amount_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-activity
    day (the cohort), revenue accumulated by days-since-first-touch —
    ``cohort, day_offset, n_cohort_users, revenue, cum_revenue,
    cum_ltv_per_user``.  The payback-period table: read across a row
    to see when a cohort's cumulative LTV crosses acquisition cost,
    read down a column to compare cohort quality at equal age.

    Scale shape: first-touch per user is one keyed aggregation (the
    volume collapse); revenue buckets to the (cohort, offset) table
    in a second map-side-combinable pass; the cumulative runs as a
    cohort-keyed window over that BOUNDED table; cohort sizes join
    back broadcast.
    """
    k = F.col(key_col)
    ts = F.col(ts_col).cast("date")
    amt = F.col(amount_col).cast("double")
    base = df.where(k.isNotNull() & ts.isNotNull() & amt.isNotNull())
    first = base.groupBy(k.alias("__k")).agg(F.min(ts).alias("cohort"))
    # first is one row per key by construction — plain count
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort_users")
    )
    j = base.join(first, k == F.col("__k")).select(
        "cohort",
        F.datediff(ts, F.col("cohort")).alias("day_offset"),
        amt.alias("__a"),
    )
    per = j.groupBy("cohort", "day_offset").agg(F.sum("__a").alias("__rev"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        per.withColumn("__cum", F.sum("__rev").over(w))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "day_offset",
            "n_cohort_users",
            F.round("__rev", round_to).alias("revenue"),
            F.round("__cum", round_to).alias("cum_revenue"),
            F.round(
                F.col("__cum") / F.col("n_cohort_users"), round_to
            ).alias("cum_ltv_per_user"),
        )
    )
    return out.orderBy("cohort", "day_offset")


def step_latency(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    state_col: str,
    from_state,
    to_state,
    round_to: int = 3,
) -> DataFrame:
    """Per-entity conversion latency: seconds from the FIRST
    ``from_state`` event to the first ``to_state`` event AT OR AFTER
    it — the time-to-convert distribution behind funnel health
    ("median signup→purchase is 2 days, p95 is 3 weeks").  Returns
    ``key, from_ts, to_ts, latency_seconds`` with NULL to_ts/latency
    for entities that reached the first step but never converted
    (feed those to `survival_curve` as censored).

    Scale shape: the first-step time is one keyed aggregation (volume
    collapse to entities); the conditional "first B after A" is a
    second aggregation of the to-events joined against that bounded
    table — two key shuffles, no window over raw events, no
    cross product.
    """
    k = F.col(key_col)
    ts = F.col(ts_col).cast("timestamp")
    st = F.col(state_col)
    base = df.where(k.isNotNull() & ts.isNotNull() & st.isNotNull())
    firsts = (
        base.where(st == F.lit(from_state))
        .groupBy(k.alias("__k"))
        .agg(F.min(ts).alias("from_ts"))
    )
    tos = base.where(st == F.lit(to_state)).select(
        k.alias("__k2"), ts.alias("__t")
    )
    conv = (
        tos.join(firsts, F.col("__k2") == F.col("__k"))
        .where(F.col("__t") >= F.col("from_ts"))
        .groupBy("__k")
        .agg(F.min("__t").alias("to_ts"))
    )
    out = firsts.join(conv, "__k", "left")
    lat = F.round(
        (F.unix_micros(F.col("to_ts")) - F.unix_micros(F.col("from_ts")))
        / F.lit(1e6),
        round_to,
    )
    return out.select(
        F.col("__k").alias(key_col),
        "from_ts",
        "to_ts",
        lat.alias("latency_seconds"),
    ).orderBy(key_col)
