"""Complex-event-processing pattern matching (Flink's MATCH_RECOGNIZE).

Flink SQL exposes row-pattern recognition through ``MATCH_RECOGNIZE``
(pattern variables + greedy quantifiers, per-key ordered scan, the
default ``AFTER MATCH SKIP PAST LAST ROW``); the reference would
delegate any such statement to Flink's CEP operator through its generic
executor (``SQLSubmitAction.java:74-76``). Spark has no built-in row
pattern matcher, so this module implements one the Spark-native way:

- the corpus is hash-partitioned by the pattern's PARTITION BY key —
  exactly how Flink's keyed CEP operator distributes, so 1000 executors
  each scan their own key ranges and no key's event sequence ever
  crosses a worker boundary;
- within a key the rows are ordered and scanned once by a small
  backtracking NFA (greedy quantifiers, contiguous steps). Per-key
  sequences are the unit of state, identical to Flink CEP's per-key
  NFA state — the scale axis is the number of keys, which shards;
- rows cross the Python boundary once, Arrow-batched via
  ``applyInPandas`` — no row-at-a-time UDF.

Only measures (a handful of scalars per match) leave the matcher, so
the operator's output is tiny compared to its input scan.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class Step:
    """One pattern variable: ``name`` matching rows where ``where``
    holds, quantified like Flink's MATCH_RECOGNIZE variables:

    - default: exactly one row
    - ``plus=True`` — ``+`` (one or more contiguous rows)
    - ``star=True`` — ``*`` (zero or more)
    - ``opt=True`` — ``?`` (zero or one)
    - ``quant=(lo, hi)`` — ``{lo,hi}`` bounds; ``hi=None`` unbounded

    Quantifiers are GREEDY with backtracking — Flink's default;
    ``reluctant=True`` flips to the lazy ``+?``/``*?``/``??`` variants
    (shortest admissible run first), which differ observably whenever
    a later variable's predicate overlaps this one's.

    ``dyn`` is an optional MATCH-STATE-DEPENDENT predicate evaluated
    per candidate row during run extension: ``dyn(ctx) → bool | None``
    over a :class:`_DynCtx` whose ``asg`` maps each pattern variable to
    the row indices mapped SO FAR in the current attempt — the current
    candidate row already tentatively appended to this variable, the
    SQL standard's running semantics (Flink's ``DEFINE B AS B.price <
    AVG(A.price)`` / ``LAST(B.price, 1)`` forms). ``None`` is SQL
    UNKNOWN and rejects the row. The static ``where`` mask still
    applies first (a vectorized prefilter; pass an all-True mask when
    the whole predicate is state-dependent).

    ``next_depth`` is streaming-only metadata: the deepest ``NEXT``
    offset this step's predicate navigates forward. The streaming
    matcher withholds the step's last ``next_depth`` closed rows from
    decisions (their masks await successors); batch ignores it.

    ``alts`` marks the step as an ALTERNATION group ``(A|B)``: a list
    of ``(member_name, member_where)`` pairs. The step's ``where``
    must be the union of the member predicates (the group matches a
    row iff SOME member does); after a match, each consumed row is
    attributed to the FIRST member whose predicate holds there
    (SQL:2016's leftmost-alternative preference, applied per row), and
    the executors register a measures segment under EACH member name.
    Sound exactly when member choice cannot affect the continuation —
    the parser therefore only builds alternations from row-local
    (static) member predicates and rejects combining them with
    match-state-dependent DEFINEs.

    ``group`` marks the step as a QUANTIFIED SEQUENCE GROUP
    ``(B C)q`` — one level of SQL:2016 pattern nesting: a list of
    child ``Step``s (plain row-local variables with their own
    quantifiers; no further nesting, no dyn, no alternation members).
    The step's own ``(lo, hi)`` bounds the REPETITION count; matching
    is the standard regex preference order — more repetitions first
    (``reluctant`` flips to fewest), each repetition's children greedy
    with full backtracking. A repetition of a REPEATING block must
    consume at least one row (a zero-width repetition cannot make
    progress); an UNQUANTIFIED block (``lo == hi == 1``) of
    all-optional members may match EMPTY, as its SQL:2016 alternation
    expansion admits — the least-preferred (greedy) / most-preferred
    (reluctant) outcome. The
    matcher reports the group's consumed positions as the step's hit
    entry and each child's positions through the ``gout`` side
    channel (:func:`_add_group_segs` registers per-child measure
    segments).

    ``perm=True`` (with ``group`` set) makes the step a SQL:2016
    ``PERMUTE(A, B, ...)`` block instead: per repetition the children
    match exactly once each, in SOME order, orderings tried in
    lexicographic preference of the listed order (the standard's
    expansion order for the equivalent alternation); child quantifiers
    still apply within an ordering. The block's own ``(lo, hi)``
    bounds the REPETITION count like a sequence group's — each
    repetition picks its order independently, with the same
    zero-width rule as sequence groups (repeating blocks must
    consume a row per repetition; an unquantified all-optional
    PERMUTE may match empty).

    ``local=True`` declares the static ``where`` (and every
    alternation member's / sequence-group child's predicate)
    ROW-LOCAL: its mask at a row depends only on that row's columns —
    no ``Series.shift`` (PREV/NEXT), no cross-row reads. When every
    step of a pattern is local, the bucketed executor evaluates all
    masks ONCE over the whole sorted bucket and slices per key
    instead of paying a pandas mask pass per key (r14: the per-key
    mask/frame overhead was ~40 % of matcher wall time at sf0.1 with
    ~1.5k keys per bucket). Default False — per-key evaluation, which
    is always sound."""

    __slots__ = ("name", "where", "lo", "hi", "reluctant", "dyn",
                 "next_depth", "alts", "group", "perm", "local")

    def __init__(
        self,
        name: str,
        where: Callable[[pd.DataFrame], pd.Series],
        plus: bool = False,
        star: bool = False,
        opt: bool = False,
        quant: "tuple[int, int | None] | None" = None,
        reluctant: bool = False,
        dyn: "Callable[[_DynCtx], Any] | None" = None,
        next_depth: int = 0,
        alts: "list[tuple[str, Callable]] | None" = None,
        group: "list[Step] | None" = None,
        perm: bool = False,
        local: bool = False,
    ):
        self.name = name
        self.where = where
        self.reluctant = reluctant
        self.dyn = dyn
        self.next_depth = next_depth
        self.alts = alts
        self.group = group
        self.perm = perm
        self.local = local
        if quant is not None:
            self.lo, self.hi = quant
        elif plus:
            self.lo, self.hi = 1, None
        elif star:
            self.lo, self.hi = 0, None
        elif opt:
            self.lo, self.hi = 0, 1
        else:
            self.lo, self.hi = 1, 1
        if self.lo < 0 or (self.hi is not None and self.hi < self.lo):
            raise ValueError(f"invalid quantifier bounds ({self.lo},{self.hi})")

    @property
    def plus(self) -> bool:  # kept for older call sites
        return self.lo == 1 and self.hi is None


class _DynCtx:
    """Evaluation context for match-state-dependent DEFINE predicates
    (``Step.dyn``). ``cols`` is the per-key dict of column → ndarray
    (the same zero-copy arrays the measures hot path reads), ``asg``
    maps each pattern variable to the list of row indices mapped so
    far in the CURRENT attempt (the candidate row already appended to
    its own variable — running semantics), ``cur`` is the candidate
    row index and ``off`` the PREV/NEXT navigation offset the compiled
    expression applies to current-row column reads."""

    __slots__ = ("cols", "asg", "cur", "off")

    def __init__(self, cols: dict):
        self.cols = cols
        self.asg: dict[str, list[int]] = {}
        self.cur = 0
        self.off = 0


def _alt_member_masks(steps: Sequence[Step], pdf: pd.DataFrame) -> dict:
    """Per alternation step: ``step.name → (member_names, choice)``
    where ``choice[row]`` is the index of the LEFTMOST member whose
    predicate holds there (-1: none) — the SQL:2016 alternative
    preference, computed ONCE per frame as vectorized mask overwrites
    (later members assigned first, earlier members overwrite)."""
    import numpy as np

    out: dict[str, Any] = {}
    for s in steps:
        if not s.alts:
            continue
        names = [aname for aname, _ in s.alts]
        choice = np.full(len(pdf), -1, dtype=np.int16)
        for k in range(len(names) - 1, -1, -1):
            m = s.alts[k][1](pdf).to_numpy(dtype=bool, na_value=False)
            choice[m] = k
        out[s.name] = (names, choice)
    return out


def _add_alt_segs(steps, hit, alt_masks, cols, segs) -> None:
    """Attribute each alternation step's matched rows to members (per
    the precomputed leftmost-choice array) and register a segment per
    member name — one vectorized compare per member, no per-row
    Python."""
    import numpy as np

    for s, pos in zip(steps, hit):
        if not s.alts:
            continue
        names, choice = alt_masks[s.name]
        pos_arr = np.asarray(pos, dtype=np.intp)
        ch = choice[pos_arr]
        for k, aname in enumerate(names):
            segs[aname] = _Seg(cols, pos_arr[ch == k])


def _add_group_segs(steps, gout: dict, cols, segs) -> None:
    """Register one measures segment per sequence-group CHILD from the
    matcher's ``gout`` side channel (positions are ascending — reps
    advance monotonically and children advance within a rep)."""
    import numpy as np

    for s in steps:
        if not getattr(s, "group", None):
            continue
        for c in s.group:
            segs[c.name] = _Seg(
                cols, np.asarray(gout.get(c.name, []), dtype=np.int64)
            )


def _group_masks(steps: Sequence[Step], pdf: pd.DataFrame) -> list:
    """Per-step boolean masks over ``pdf`` — a LIST of child masks for
    sequence-group steps, one array otherwise (the shape
    :func:`_run_ends` and the matcher's group branch expect)."""
    return [
        [
            c.where(pdf).to_numpy(dtype=bool, na_value=False)
            for c in s.group
        ]
        if getattr(s, "group", None)
        else s.where(pdf).to_numpy(dtype=bool, na_value=False)
        for s in steps
    ]


#: default per-attempt backtracking budget — far above any contract
#: pattern (the heaviest contract query measures <2k steps per attempt;
#: see tests/test_match_budget.py) yet small enough that an adversarial
#: pattern with the classic exponential worst case (overlapping
#: quantifiers, e.g. ``(A+ B+)+ C`` with C never true on a long
#: uniform key) dies in well under a second with a diagnostic instead
#: of hanging an executor. Configurable per session via
#: ``SET 'spark.flinkcommons.mr.max-steps' = '<n>'``.
DEFAULT_MAX_STEPS = 1_000_000


class MatchStepBudgetExceeded(RuntimeError):
    """One MATCH_RECOGNIZE match attempt exceeded its backtracking
    step budget — the pattern almost certainly has an exponential
    worst case (overlapping quantifiers such as ``(A+ B+)+`` over rows
    where both predicates hold). Raised instead of silently pinning an
    executor core; rewrite the pattern so adjacent quantified
    variables have disjoint predicates, or raise the budget with
    ``SET 'spark.flinkcommons.mr.max-steps'``."""


def _run_ends(masks: list, n: int) -> list:
    """Per step, ``run_end[pos]`` = first index ≥ ``pos`` where the
    step's mask is False (or ``n``) — the end of the contiguous True
    run starting at ``pos``. One O(n) vectorized suffix-min per mask,
    computed once per key, turns the matcher's per-start run scan into
    an O(1) lookup (the scan was O(run length) per start, O(n²) per
    key for wildcard steps). Plain Python lists, not ndarrays: scalar
    ndarray indexing returns np.int64, which poisons every downstream
    arithmetic op in the hot recursion. A ``[n]`` sentinel so
    ``pos == n`` needs no bounds check. A sequence-group step's masks
    entry is a LIST of child masks — its run-end entry is the matching
    list of per-child tables."""
    import numpy as np

    idx = np.arange(n, dtype=np.int64)

    def table(m):
        arr = np.where(np.asarray(m, dtype=bool), n, idx)
        arr = np.minimum.accumulate(arr[::-1])[::-1]
        return arr.tolist() + [n]

    return [
        [table(mm) for mm in m] if isinstance(m, list) else table(m)
        for m in masks
    ]


def _match_at_ex(
    masks: list,
    steps: Sequence[Step],
    start: int,
    n: int,
    run_ends: "list | None" = None,
    failed: "set | None" = None,
    dctx: "_DynCtx | None" = None,
    step_bounds: "list[int] | None" = None,
    undecided_n: "int | None" = None,
    gout: "dict | None" = None,
    max_steps: "int | None" = None,
    pattern_desc: "str | None" = None,
    strict_budget: bool = False,
) -> "tuple[list | None, int]":
    """Greedy backtracking match of ``steps`` against positions
    ``start..`` — returns (per-step position ranges or None,
    touched_end). ``touched_end`` is a BITMASK of the KINDS of
    boundary the exploration ran against instead of failing a
    predicate (0 = none — every cut was a decided predicate/quantifier
    verdict): bit 1 = cut at the scan end ``n`` while that end is
    UNDECIDED (see ``undecided_n``), bit 2 = cut at a step's NEXT
    frontier (``step_bounds``). A streaming caller matching a closed
    prefix must treat any nonzero touched failure as NOT-YET-DECIDED
    (future rows could complete or change it), where a predicate
    failure is permanent. The mask is a sound over-approximation: a
    bit may be set for attempts no future row could save, never clear
    for one a future row could change.

    ``undecided_n`` classifies cuts at the scan end ``n``: positions
    at/after it are undecided-because-unclosed (the true data end of a
    live stream's closed prefix), so a cut at ``n >= undecided_n``
    sets bit 1, while ``n < undecided_n`` means the scan end is a
    DECIDED boundary (a WITHIN window edge strictly inside the closed
    prefix) and the cut is a permanent verdict (no bit). ``None``
    (the default, and the batch behavior) treats every end cut as
    undecided — equivalent to ``undecided_n = 0``.

    ``run_ends`` (from :func:`_run_ends`) makes each greedy-run scan
    O(1). ``failed`` is an optional cross-start memo of (pos, step)
    states already proven unmatchable — sound ONLY when every call
    shares the same masks/steps/``n`` AND the caller ignores
    ``touched_end`` (a memo hit does not replay the touched flag), so
    the batch scan passes it and the streaming scan must not.

    ``dctx`` enables MATCH-STATE-DEPENDENT steps (``Step.dyn``): every
    step's row assignment is tracked in ``dctx.asg`` as the recursion
    unwinds, and a dyn step's run extends row-by-row, each candidate
    tentatively appended to its variable BEFORE its predicate runs
    (running semantics — ``LAST(V.col, 1)`` at V's first row is NULL).
    A dyn rejection is a PREDICATE failure (permanent for streaming);
    only a run cut by the data end marks ``touched_end``. ``failed``
    must be None when any step is dynamic — the same (pos, step) can
    succeed under a different upstream assignment.

    ``step_bounds`` (streaming NEXT support) marks, per step, the
    first position whose mask is NOT YET DECIDED — a forward-navigating
    step's last rows await successors. Rows at/after a step's bound
    are treated exactly like rows past the data end FOR THAT STEP: the
    run is cut there and ``touched_end`` bit 2 set (not-yet-decided),
    never a predicate verdict. Steps without forward navigation keep
    the full range, so a decided match ending on another step's
    frontier still completes. A frontier cut is undecided regardless
    of ``undecided_n`` — the frontier row's mask decides when its
    successors close, even inside a closed WITHIN window.

    ``gout`` (required when any step is a sequence GROUP, ignored
    otherwise) receives, on a successful match, each group child's
    consumed positions as ``{child_name: [int, ...]}`` — the side
    channel the callers use to register per-child measure segments
    (:func:`_add_group_segs`). Read it only after a non-None return;
    a later failed attempt does not clear a prior success's entries.
    Group steps carry no ``dyn`` and no NEXT navigation (the SQL
    front door rejects those combinations), so the failure memo stays
    sound for them: a group's match at ``(pos, step)`` is fully
    determined by the masks.

    ``max_steps`` bounds the GROUP/PERMUTE sub-NFA recursion count of
    THIS attempt (``None`` → :data:`DEFAULT_MAX_STEPS`) — the axis
    with the standard regex-backtracking exponential worst case;
    without a budget an adversarial pattern pins an executor core
    with no diagnostic. Top-level plain-step recursion is bounded
    separately at ``max(max_steps, 64·(n+1)·nsteps)`` — proportional
    to the scan, so a linear pattern over an arbitrarily long skewed
    key never trips it, while a polynomial plain-step blowup
    (O(n²)+ takes per attempt) still dies. ``strict_budget=True``
    removes that scan-proportional floor and bounds BOTH axes at
    ``max_steps`` verbatim — the hard per-attempt latency bound a
    caller gets by opting in via ``SET
    'spark.flinkcommons.mr.strict-steps' = 'true'`` (ADVICE r13: with
    the floor, the conf knob alone cannot tighten plain recursion
    below ~64·n ticks on a long key). Exceeding either raises
    :class:`MatchStepBudgetExceeded` naming the axis and
    ``pattern_desc`` (the PATTERN text when the SQL front door is the
    caller)."""
    touched = 0
    nsteps = len(steps)
    budget = max_steps if max_steps is not None else DEFAULT_MAX_STEPS
    # Two budget axes (advisor r12): the EXPONENTIAL axis is the
    # group/PERMUTE sub-NFA recursion count — that is what the conf
    # knob bounds, and the only way a pattern's work can explode
    # combinatorially. Top-level plain-step recursion is at worst
    # polynomial in the scan length (a take loop per quantified step),
    # and a perfectly legitimate linear pattern — ``A+ B`` with B never
    # true over a single key whose contiguous run exceeds ~budget rows
    # — does O(run) rec() calls in ONE attempt; ticking it against the
    # 1M default turned a skewed-but-linear key into a false
    # MatchStepBudgetExceeded. The plain axis therefore gets
    # max(budget, 64·(n+1)·nsteps): never stricter than the conf value
    # (so no r12 behavior tightens) and proportional to the scan, so
    # any truly linear pattern completes at any key size while a
    # polynomial plain-step blowup (O(n²)+ per attempt — a genuine
    # scale-killer on big keys) still dies with the diagnostic.
    group_left = budget
    plain_bound = (
        budget if strict_budget
        else max(budget, 64 * (n + 1) * max(1, nsteps))
    )
    plain_left = plain_bound

    def _raise_budget(axis: str, bound: int) -> None:
        desc = pattern_desc or "(" + " ".join(
            s.name for s in steps
        ) + ")"
        hint = (
            "the pattern likely has overlapping quantifiers with an "
            "exponential worst case (e.g. (A+ B+)+ where both "
            "predicates hold on the same rows)"
            if axis == "sub-NFA" else
            "adjacent quantified variables with overlapping predicates "
            "are exploring a super-linear number of take combinations "
            "on a long key (e.g. A+ B+ C with A and B both true and C "
            "never)"
        )
        raise MatchStepBudgetExceeded(
            f"MATCH_RECOGNIZE backtracking exceeded {bound:,} "
            f"{axis} steps in one match attempt for pattern {desc} — "
            f"{hint}. Rewrite the pattern with disjoint adjacent "
            "predicates, or raise the budget via "
            "SET 'spark.flinkcommons.mr.max-steps'."
        )

    def _budget() -> None:
        # one tick per group/PERMUTE sub-NFA recursion step — the
        # exponential axis; per-row run scans inside a step are linear
        # and not counted
        nonlocal group_left
        group_left -= 1
        if group_left < 0:
            _raise_budget("sub-NFA", budget)

    def _budget_plain() -> None:
        # top-level recursion tick — bounded by the scan-proportional
        # plain axis (see above), never stricter than the conf budget
        nonlocal plain_left
        plain_left -= 1
        if plain_left < 0:
            # report the bound actually enforced — under strict-steps
            # that is the conf value verbatim, not the scan floor
            _raise_budget("plain-step", plain_bound)
    end_kind = 1 if undecided_n is None or n >= undecided_n else 0
    if dctx is not None:
        dctx.asg.clear()  # stale entries from a prior attempt must
        # not leak into predicates referencing not-yet-mapped variables

    def rec(pos: int, si: int) -> list | None:
        nonlocal touched
        _budget_plain()
        if si == nsteps:
            return []
        if failed is not None and (pos, si) in failed:
            return None
        s = steps[si]
        sb = n if step_bounds is None else min(n, step_bounds[si])
        # the kind of boundary a cut at ``sb`` represents: the step's
        # NEXT frontier (strictly inside the scan range → bit 2) or
        # the scan end (undecided data end → bit 1, decided WITHIN
        # edge → no bit)
        kind = 2 if sb < n else end_kind
        if pos >= sb and (s.lo > 0 or kind == 2):
            # no decidable row left: a REQUIRED step at/past its
            # boundary is cut undecided; an OPTIONAL (lo=0) step past
            # its NEXT frontier is too — its 0-take "succeeds", but
            # greedy would prefer any take the frontier rows could
            # decide later. (For lo=0 at the plain data end the final-
            # variable growable rule already covers the emission-side
            # risk, so only the frontier kind flags here.)
            touched |= kind
        if s.group is not None:
            res = (
                _rec_permute(pos, si, sb, kind) if s.perm
                else _rec_group(pos, si, sb, kind)
            )
            if res is None and failed is not None:
                failed.add((pos, si))
            return res
        # greedy: consume the longest admissible run first, backtrack
        # shorter down to the quantifier's lower bound (0 for */?);
        # reluctant flips the try order (shortest first)
        limit = sb if s.hi is None else min(sb, pos + s.hi)
        dyn = s.dyn if dctx is not None else None
        if dyn is None:
            if run_ends is not None:
                end = min(limit, run_ends[si][pos])
            else:
                mask = masks[si]
                end = pos
                while end < limit and mask[end]:
                    end += 1
            if end == sb and (s.hi is None or end - pos < s.hi):
                # the run was cut at the step's boundary, not by the
                # predicate — undecided unless it's a WITHIN edge
                touched |= kind
            full = None
        else:
            # state-dependent extension: static mask prefilter, then
            # the dyn predicate with the candidate row appended
            mask = masks[si]
            run = dctx.asg[s.name] = []
            end = pos
            cut_by_pred = False
            while end < limit:
                if not mask[end]:
                    cut_by_pred = True
                    break
                run.append(end)
                dctx.cur = end
                v = dyn(dctx)
                if v is None or not v:
                    run.pop()
                    cut_by_pred = True
                    break
                end += 1
            if (
                not cut_by_pred
                and end == sb
                and (s.hi is None or end - pos < s.hi)
            ):
                touched |= kind
            full = list(range(pos, end))
        takes = range(end - pos, s.lo - 1, -1)
        if s.reluctant:
            takes = range(s.lo, end - pos + 1)
        for take in takes:
            if dctx is not None:
                dctx.asg[s.name] = (
                    full[:take] if full is not None
                    else list(range(pos, pos + take))
                )
            rest = rec(pos + take, si + 1)
            if rest is not None:
                return [range(pos, pos + take)] + rest
        if dctx is not None:
            dctx.asg[s.name] = []
        if failed is not None:
            failed.add((pos, si))
        return None

    def _rec_group(pos: int, si: int, sb: int, kind: int) -> list | None:
        """Sequence-group step: match the child sequence ``reps``
        times (standard regex preference — more repetitions first,
        children greedy, full backtracking through child takes then
        repetition count; ``reluctant`` flips the repetition order),
        then the REST of the pattern. Each repetition must consume at
        least one row. On overall success the group's hit entry is the
        flat consumed-position list and ``gout`` gets each child's
        positions."""
        nonlocal touched
        s = steps[si]
        children = s.group
        cmasks = masks[si]
        cruns = run_ends[si] if run_ends is not None else None
        # an UNQUANTIFIED block (exactly one repetition) whose members
        # are all optional may match EMPTY — the SQL:2016 alternation
        # expansion of e.g. (A? B?) / PERMUTE(A?, B?) admits the empty
        # word. A REPEATING block keeps the zero-width bar (a
        # no-progress repetition cannot loop); that divergence for
        # {n,m}-quantified all-optional blocks is deliberate and
        # documented (COVERAGE.md).
        empty_ok = s.lo == 1 and s.hi == 1

        reps: list = []  # completed repetitions: [(ci, range), ...] each
        rep_start = [pos]

        def rec_child(p2: int, ci: int, cur: list) -> list | None:
            nonlocal touched
            _budget()
            if ci == len(children):
                if p2 == rep_start[0] and not (empty_ok and not reps):
                    return None  # zero-width repetition: no progress
                reps.append(cur)
                res = rec_reps(p2)
                if res is None:
                    reps.pop()
                return res
            c = children[ci]
            limit = sb if c.hi is None else min(sb, p2 + c.hi)
            if cruns is not None:
                end = min(limit, cruns[ci][p2])
            else:
                m = cmasks[ci]
                end = p2
                while end < limit and m[end]:
                    end += 1
            if end == sb and (c.hi is None or end - p2 < c.hi):
                # run cut by the step boundary, not the predicate
                touched |= kind
            takes = (
                range(end - p2, c.lo - 1, -1) if not c.reluctant
                else range(c.lo, end - p2 + 1)
            )
            for take in takes:
                res = rec_child(
                    p2 + take, ci + 1, cur + [(ci, range(p2, p2 + take))]
                )
                if res is not None:
                    return res
            return None

        def rec_reps(p2: int) -> list | None:
            nonlocal touched
            _budget()
            nreps = len(reps)
            more_ok = s.hi is None or nreps < s.hi
            if more_ok and p2 >= sb:
                # another (greedy-preferred) repetition is allowed but
                # no decidable row remains — cut at the boundary
                touched |= kind
            opts = ("rep", "done") if not s.reluctant else ("done", "rep")
            for o in opts:
                if o == "rep" and more_ok and p2 < sb:
                    prev_start = rep_start[0]
                    rep_start[0] = p2
                    res = rec_child(p2, 0, [])
                    rep_start[0] = prev_start
                    if res is not None:
                        return res
                elif o == "done" and (
                    nreps >= s.lo
                    # unquantified all-optional block at/after the
                    # scan boundary: no row to try, but the block
                    # matches empty (p2 < sb explores the empty body
                    # through the rep branch's all-zero takes instead)
                    or (empty_ok and nreps == 0 and p2 >= sb
                        and all(c.lo == 0 for c in children))
                ):
                    rest = rec(p2, si + 1)
                    if rest is not None:
                        flat = [
                            int(q) for rep in reps for _, rng in rep
                            for q in rng
                        ]
                        if gout is not None:
                            per_child: dict[str, list] = {
                                c.name: [] for c in children
                            }
                            for rep in reps:
                                for ci, rng in rep:
                                    per_child[children[ci].name].extend(
                                        int(q) for q in rng
                                    )
                            gout.update(per_child)
                        return [flat] + rest
            return None

        return rec_reps(pos)

    def _rec_permute(pos: int, si: int, sb: int, kind: int) -> list | None:
        """``PERMUTE(A, B, ...)q`` step: each REPETITION matches every
        child exactly once in SOME order — orderings tried per
        repetition in lexicographic preference of the listed order
        (SQL:2016's expansion order for the equivalent alternation
        ``(A B | B A)q``), children greedy with full backtracking
        within an ordering — and the step's own ``(lo, hi)`` bounds
        the repetition count with the standard preference (more
        repetitions first; ``reluctant`` flips it), exactly like
        :func:`_rec_group`. Each repetition picks its order
        independently and must consume at least one row."""
        nonlocal touched
        import itertools as _it

        s = steps[si]
        children = s.group
        cmasks = masks[si]
        cruns = run_ends[si] if run_ends is not None else None
        orders = list(_it.permutations(range(len(children))))
        # same empty-body rule as _rec_group: an unquantified PERMUTE
        # of all-optional members may match empty (its SQL:2016
        # alternation expansion admits the empty word); repeating
        # blocks keep the zero-width bar
        empty_ok = s.lo == 1 and s.hi == 1

        reps: list = []  # completed repetitions: [(ci, range), ...] each
        rep_start = [pos]

        def match_seq(p2: int, order_, oi: int, acc: list) -> list | None:
            nonlocal touched
            _budget()
            if oi == len(order_):
                if p2 == rep_start[0] and not (empty_ok and not reps):
                    return None  # zero-width repetition: no progress
                reps.append(acc)
                res = rec_reps(p2)
                if res is None:
                    reps.pop()
                return res
            ci = order_[oi]
            c = children[ci]
            limit = sb if c.hi is None else min(sb, p2 + c.hi)
            if cruns is not None:
                end = min(limit, cruns[ci][p2])
            else:
                m = cmasks[ci]
                end = p2
                while end < limit and m[end]:
                    end += 1
            if end == sb and (c.hi is None or end - p2 < c.hi):
                touched |= kind
            takes = (
                range(end - p2, c.lo - 1, -1) if not c.reluctant
                else range(c.lo, end - p2 + 1)
            )
            for take in takes:
                res = match_seq(
                    p2 + take, order_, oi + 1,
                    acc + [(ci, range(p2, p2 + take))],
                )
                if res is not None:
                    return res
            return None

        def rec_reps(p2: int) -> list | None:
            nonlocal touched
            _budget()
            nreps = len(reps)
            more_ok = s.hi is None or nreps < s.hi
            if more_ok and p2 >= sb:
                # another (greedy-preferred) repetition is allowed but
                # no decidable row remains — cut at the boundary
                touched |= kind
            opts = ("rep", "done") if not s.reluctant else ("done", "rep")
            for o in opts:
                if o == "rep" and more_ok and p2 < sb:
                    prev_start = rep_start[0]
                    rep_start[0] = p2
                    for order_ in orders:
                        res = match_seq(p2, order_, 0, [])
                        if res is not None:
                            rep_start[0] = prev_start
                            return res
                    rep_start[0] = prev_start
                elif o == "done" and (
                    nreps >= s.lo
                    # unquantified all-optional block at/after the
                    # scan boundary: no row to try, but the block
                    # matches empty (p2 < sb explores the empty body
                    # through the rep branch's all-zero takes instead)
                    or (empty_ok and nreps == 0 and p2 >= sb
                        and all(c.lo == 0 for c in children))
                ):
                    rest = rec(p2, si + 1)
                    if rest is not None:
                        flat = sorted(
                            int(q) for rep in reps for _, rng in rep
                            for q in rng
                        )
                        if gout is not None:
                            per_child: dict[str, list] = {
                                c.name: [] for c in children
                            }
                            for rep in reps:
                                for ci, rng in rep:
                                    per_child[children[ci].name].extend(
                                        int(q) for q in rng
                                    )
                            gout.update(per_child)
                        return [flat] + rest
            return None

        return rec_reps(pos)

    return rec(start, 0), touched


def _match_at(
    masks: list,
    steps: Sequence[Step],
    start: int,
    n: int,
    run_ends: "list | None" = None,
    failed: "set | None" = None,
    dctx: "_DynCtx | None" = None,
    gout: "dict | None" = None,
    max_steps: "int | None" = None,
    pattern_desc: "str | None" = None,
    strict_budget: bool = False,
) -> list | None:
    """Greedy backtracking match of ``steps`` against positions
    ``start..`` — returns per-step position ranges, or None."""
    return _match_at_ex(
        masks, steps, start, n, run_ends, failed, dctx, gout=gout,
        max_steps=max_steps, pattern_desc=pattern_desc,
        strict_budget=strict_budget,
    )[0]


def _step_bounds(steps: Sequence[Step], n: int) -> "list[int] | None":
    """Per-step undecided frontiers over an ``n``-row closed prefix:
    ``n - next_depth`` for forward-navigating steps, ``n`` otherwise.
    None when no step navigates forward (the common case — zero
    overhead in the recursion)."""
    depths = [getattr(s, "next_depth", 0) or 0 for s in steps]
    if not any(depths):
        return None
    return [n - d for d in depths]


class _Seg:
    """Zero-copy view of one pattern variable's matched rows, handed
    to the ``measures`` callable as ``segs[var]``. Behaves like the
    matched pandas sub-frame for the supported surface — ``seg[col]``
    returns a pandas Series over the matched slice (a numpy view, no
    copy), ``len(seg)`` the row count — without the per-match
    ``DataFrame.iloc[list]`` materialization that dominated the
    matcher's profile (~75 % of wall time at sf0.1: three block-manager
    ``take``s per match for a handful of scalar reads).

    ``rng`` is a contiguous ``range`` for plain pattern variables (the
    zero-copy slice path); alternation MEMBERS attribute possibly
    NON-contiguous rows, passed as an integer position array — those
    read via numpy fancy indexing (a copy, but member segments are a
    handful of rows)."""

    __slots__ = ("_cols", "_rng")

    def __init__(self, cols: dict, rng):
        self._cols = cols
        self._rng = rng

    def __len__(self) -> int:
        return len(self._rng)

    def __getitem__(self, col: str) -> pd.Series:
        r = self._rng
        a = self._cols[col]
        return pd.Series(a[r.start : r.stop] if type(r) is range else a[r])

    def scalar(self, col: str, i: int):
        """One value of ``col`` at position ``i`` (negative = from the
        end) without Series construction — the measures hot path."""
        r = self._rng
        if type(r) is range:
            return self._cols[col][r.start + i if i >= 0 else r.stop + i]
        return self._cols[col][r[i]]

    def array(self, col: str):
        """Numpy view of ``col`` over the matched slice (fancy-index
        copy for non-contiguous alternation-member positions)."""
        r = self._rng
        a = self._cols[col]
        return a[r.start : r.stop] if type(r) is range else a[r]

    def to_frame(self) -> pd.DataFrame:
        """Materialize the full matched slice (rarely needed)."""
        r = self._rng
        if type(r) is range:
            return pd.DataFrame(
                {c: a[r.start : r.stop] for c, a in self._cols.items()}
            )
        return pd.DataFrame({c: a[r] for c, a in self._cols.items()})


def _null_where(out, bad):
    """``out`` with SQL NULL (None) at ``bad`` positions — stays a
    native-dtype array on the no-NULL fast path, promotes to object
    only when a NULL actually occurs (arrow converts both)."""
    if not bad.any():
        return out
    res = out.astype(object)
    res[bad] = None
    return res


class _VecSeg:
    """Vectorized RUNNING view of one pattern variable's matched rows
    under ``ALL ROWS PER MATCH``: every read returns one value PER
    OUTPUT ROW of the match (a numpy array aligned with the emitted
    rows), computed by prefix scans over the variable's member rows —
    O(match_len) total where the per-row truncated-segment loop was
    O(match_len²) for running aggregates.

    ``pos_arr`` is the match's sorted row positions (one per output
    row); ``mpos`` the variable's sorted member positions.  The
    running view at output row *i* is exactly the members at positions
    ``<= pos_arr[i]`` — ``cnt[i]`` of them, via one ``searchsorted``.
    NULL-skip semantics mirror the scalar measures path
    (:class:`~flink_commons_spark.plans.match_recognize._ExprParser`):
    non-nullable numeric dtypes reduce directly; float skips NaN;
    other dtypes skip None/NaN via a per-member Python prefix pass
    (still O(members), not O(members²))."""

    __slots__ = ("_cols", "_mpos", "_cnt")

    def __init__(self, cols: dict, mpos, pos_arr):
        self._cols = cols
        self._mpos = mpos
        self._cnt = np.searchsorted(mpos, pos_arr, side="right")

    def vec_count(self):
        """RUNNING ``COUNT(V.*)`` — members at/before each row."""
        return self._cnt.astype(np.int64)

    def _member_vals(self, col: str):
        return self._cols[col][self._mpos]

    def vec_first(self, col: str, n: int):
        """RUNNING ``FIRST(V.col, n)`` — constant once the (n+1)-th
        member is reached, NULL before."""
        mv = self._member_vals(col)
        k = self._cnt
        out = np.empty(len(k), dtype=object)
        out[:] = None
        if n < len(mv):
            out[k > n] = mv[n]
            if bool((k > n).all()):
                return np.full(len(k), mv[n])
        return out

    def vec_last(self, col: str, n: int):
        """RUNNING ``LAST(V.col, n)`` (n=0 is the bare ``V.col``
        measures read) — the (cnt-1-n)-th member value per row."""
        mv = self._member_vals(col)
        k = self._cnt
        idx = k - 1 - n
        bad = idx < 0
        if len(mv) == 0:
            out = np.empty(len(k), dtype=object)
            out[:] = None
            return out
        return _null_where(mv[np.where(bad, 0, idx)], bad)

    def vec_reduce(self, col: str, fname: str):
        """RUNNING SUM/MIN/MAX/AVG over the members at/before each
        row, SQL NULL-skip semantics, via one prefix scan.

        Integer SUM/AVG use ``np.cumsum`` on the source dtype, which
        WRAPS silently on int64 overflow — the same wrap the per-row
        scalar reduction's ``np.sum`` had, so engine parity holds, but
        note the prefix scan carries the running total of the WHOLE
        match (the widest intermediate). A column whose per-match
        total can approach 2^63 needs a cast to double (or decimal)
        in the source view."""
        mv = self._member_vals(col)
        k = self._cnt
        none_rows = k == 0
        if len(mv) == 0:
            out = np.empty(len(k), dtype=object)
            out[:] = None
            return out
        idx = np.where(none_rows, 0, k - 1)
        kind = mv.dtype.kind
        if kind in "iub":
            # non-nullable numerics — the zero-copy fast path (same
            # dtype family the scalar path reduces directly)
            if fname == "SUM":
                return _null_where(np.cumsum(mv)[idx], none_rows)
            if fname == "MIN":
                return _null_where(np.minimum.accumulate(mv)[idx], none_rows)
            if fname == "MAX":
                return _null_where(np.maximum.accumulate(mv)[idx], none_rows)
            # AVG: exact integer prefix sums, one float division
            return _null_where(
                np.cumsum(mv)[idx] / np.where(none_rows, 1, k), none_rows
            )
        if kind == "f":
            valid = ~np.isnan(mv)
            vcnt = np.cumsum(valid)
            nvalid = vcnt[idx]
            bad = none_rows | (nvalid == 0)
            if fname in ("SUM", "AVG"):
                pre = np.cumsum(np.where(valid, mv, 0.0))
                out = pre[idx]
                if fname == "AVG":
                    out = out / np.where(bad, 1, nvalid)
                return _null_where(out, bad)
            fill = np.inf if fname == "MIN" else -np.inf
            acc = (np.minimum if fname == "MIN" else np.maximum).accumulate(
                np.where(valid, mv, fill)
            )
            return _null_where(acc[idx], bad)
        # object / datetime dtypes: per-member Python prefix pass
        # (None/NaN/NaT skipped, matching the scalar list path)
        import operator as _op

        if fname == "AVG":
            sums: list = []
            cnts: list = []
            s = 0
            c = 0
            for v in mv.tolist():
                if v is not None and v == v:
                    s += v
                    c += 1
                sums.append(s)
                cnts.append(c)
            out = np.empty(len(k), dtype=object)
            for i, j in enumerate(idx):
                out[i] = (
                    None if none_rows[i] or cnts[j] == 0
                    else sums[j] / cnts[j]
                )
            return out
        red2 = {"SUM": _op.add, "MIN": min, "MAX": max}[fname]
        pre: list = []
        cur = None
        for v in mv.tolist():
            if v is not None and v == v:
                cur = v if cur is None else red2(cur, v)
            pre.append(cur)
        out = np.empty(len(k), dtype=object)
        for i, j in enumerate(idx):
            out[i] = None if none_rows[i] else pre[j]
        return out


class _VecSegs:
    """Lazy ``{var: _VecSeg}`` mapping handed to the ALL ROWS measures
    context as ``ctx["segs"]`` — each variable's prefix-count array is
    built on first access, so FINAL-only measure lists never pay it."""

    __slots__ = ("_segs", "_pos_arr", "_cache")

    def __init__(self, segs: dict, pos_arr):
        self._segs = segs
        self._pos_arr = pos_arr
        self._cache: dict = {}

    def __getitem__(self, var: str) -> _VecSeg:
        v = self._cache.get(var)
        if v is None:
            seg = self._segs[var]
            r = seg._rng
            mpos = (
                np.arange(r.start, r.stop, dtype=np.int64)
                if type(r) is range else np.asarray(r, dtype=np.int64)
            )
            v = _VecSeg(seg._cols, mpos, self._pos_arr)
            self._cache[var] = v
        return v


def _assemble_all_rows(
    chunks: "list[tuple[int, dict]]", out_cols: "list[str]"
) -> pd.DataFrame:
    """One columnar frame from per-match ALL ROWS chunks.  Each chunk
    is ``(n_rows, {col: per-row ndarray | match-constant scalar})`` —
    scalars (FINAL aggregates, MATCH_NUMBER, partition keys) expand
    here, once per match, and every output column concatenates exactly
    once per pandas group invocation (no per-row dict building)."""
    if not chunks:
        return pd.DataFrame(columns=out_cols)
    data = {}
    for c in out_cols:
        parts = []
        for n, d in chunks:
            v = d[c]
            if isinstance(v, np.ndarray) and v.ndim == 1 and len(v) == n:
                parts.append(v)
            elif v is None:
                a = np.empty(n, dtype=object)
                a[:] = None
                parts.append(a)
            else:
                parts.append(np.full(n, v))
        data[c] = parts[0] if len(parts) == 1 else np.concatenate(parts)
    return pd.DataFrame(data)


def match_pattern(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    steps: Sequence[Step],
    measures: Callable[[tuple, dict[str, pd.DataFrame]], dict[str, Any]],
    output_schema: str,
    group_buckets: int | None = 64,
    after_match: "str | tuple[str, str]" = "past_last",
    within_us: "int | None" = None,
    all_rows: bool = False,
    number_matches: bool = False,
    max_steps: "int | None" = None,
    pattern_desc: "str | None" = None,
    strict_budget: bool = False,
) -> DataFrame:
    """MATCH_RECOGNIZE-style pattern matching over a keyed, ordered
    event table.

    ``number_matches=True`` (ONE ROW mode only; ``all_rows`` implies
    it) calls ``measures(key, segs, n_match)`` with the per-key
    scan-order match ordinal — ``MATCH_NUMBER()`` under ONE ROW PER
    MATCH.

    Matches are contiguous (every row between the first and last row of
    a match belongs to some step), quantifiers are greedy with
    backtracking, and the scan resumes per ``after_match`` — Flink's
    AFTER MATCH SKIP strategies:

    - ``"past_last"`` (default): resume after the match's last row
    - ``"to_next_row"``: resume at the row after the match's FIRST row
      (overlapping matches are emitted)
    - ``("to_first", var)`` / ``("to_last", var)``: resume at the
      first/last row mapped to pattern variable ``var``; raises (as
      Flink does) if that would not advance the scan or if ``var``
      matched no row.

    ``measures`` receives the key tuple and a dict of step-name →
    matched rows (pandas), and returns one output row per match.

    ``within_us`` is Flink's ``PATTERN ... WITHIN interval``: a match
    must COMPLETE within the interval of its first row, measured on
    the first ``order_cols`` column (which must therefore be the
    event-time microseconds). Matches are contiguous, so bounding the
    scan end at the window edge enforces the semantics exactly — the
    same rule the streaming matcher applies.

    ``group_buckets`` bounds the number of PYTHON group invocations:
    the shuffle keys on ``hash(key) % group_buckets`` and the per-key
    NFA loops inside pandas, so Arrow round-trip count tracks the
    bucket count, not key cardinality (20k user keys = 20k tiny
    pandas calls otherwise; measured ~2x on the conversion-funnel
    query). Semantics are identical — every key is still matched in
    isolation. ``None`` restores one-group-per-key.

    ``all_rows=True`` is the ``ALL ROWS PER MATCH`` emission contract:
    ``measures`` is called as ``measures(key, segs, n_match)`` — the
    per-key scan-order match ordinal, counted afresh for every group
    invocation so a stage retry that re-presents a key cannot resume a
    stale counter — and returns a per-match columnar chunk
    ``(n_rows, {col: array|scalar})``; all chunks of a pandas group
    assemble into ONE frame (:func:`_assemble_all_rows`), no per-row
    Python loop anywhere on the path.
    """
    step_list = list(steps)
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    out_cols = [f.name for f in StructType.fromDDL(output_schema).fields]
    if isinstance(after_match, tuple):
        skip_kind, skip_var = after_match
        if skip_kind not in ("to_first", "to_last"):
            raise ValueError(f"unknown after_match {after_match!r}")
        skip_idx = next(
            (k for k, s in enumerate(step_list) if s.name == skip_var), None
        )
        if skip_idx is None:
            raise ValueError(f"after_match variable {skip_var!r} not in pattern")
    elif after_match not in ("past_last", "to_next_row"):
        raise ValueError(f"unknown after_match {after_match!r}")

    def _resume(i: int, hit: list) -> int:
        if after_match == "past_last":
            return max(seg[-1] for seg in hit if seg) + 1
        if after_match == "to_next_row":
            return i + 1
        seg = hit[skip_idx]
        if not seg:
            raise ValueError(
                f"AFTER MATCH SKIP {after_match[0]} {skip_var}: variable "
                "matched no row (Flink raises here too)"
            )
        nxt = seg[0] if after_match[0] == "to_first" else seg[-1]
        if nxt <= i:
            raise ValueError(
                f"AFTER MATCH SKIP {after_match[0]} {skip_var} would not "
                "advance the scan — infinite loop (Flink raises here too)"
            )
        return nxt

    has_group = any(s.group is not None for s in step_list)
    has_dyn = any(s.dyn is not None for s in step_list)
    # bucket-level mask evaluation (run_bucket fast path) is sound only
    # when every step's static mask is row-local (Step.local): a
    # shift-based PREV/NEXT mask evaluated over a concatenated
    # multi-key frame would leak values across key boundaries
    bucket_local = all(s.local for s in step_list)

    def scan_core(
        key: tuple,
        n: int,
        masks: list,
        alt_masks: dict,
        cols: dict,
        ts,
    ) -> list:
        """Per-key NFA scan over precomputed masks/columns — the loop
        both the per-key and the bucket-sliced paths share."""
        run_ends = _run_ends(masks, n)
        gout: "dict | None" = {} if has_group else None
        dctx = _DynCtx(cols) if has_dyn else None
        # cross-start failure memo — sound here because every start
        # shares masks/steps and the batch scan ignores touched_end;
        # WITHIN varies the scan bound n_i per start, and dyn steps
        # vary by upstream assignment, so memo off for both
        failed: "set | None" = (
            set() if within_us is None and not has_dyn else None
        )
        # jump between admissible starts: when the first variable is
        # required (lo > 0) a match can only begin where its mask holds,
        # so positions outside masks[0] need no NFA attempt at all
        # (a group-first pattern skips the jump — its masks entry is
        # the per-child list, and the group's first admissible row is
        # rep-structure-dependent)
        starts = (
            np.flatnonzero(masks[0]).tolist()
            if step_list[0].lo > 0 and step_list[0].group is None
            else None
        )
        s_ptr = 0
        out: list = []
        n_match = 0
        i = 0
        while i < n:
            if starts is not None:
                while s_ptr < len(starts) and starts[s_ptr] < i:
                    s_ptr += 1
                if s_ptr == len(starts):
                    break
                i = starts[s_ptr]
            n_i = n
            if ts is not None:
                # Flink's NFA prunes once timestamp >= start + window —
                # the window edge is EXCLUSIVE (a row landing exactly on
                # first_ts + within is outside), hence side='left'
                n_i = int(np.searchsorted(ts, ts[i] + within_us, side="left"))
            hit = _match_at(
                masks, step_list, i, n_i, run_ends, failed, dctx, gout=gout,
                max_steps=max_steps, pattern_desc=pattern_desc,
                strict_budget=strict_budget,
            )
            if hit is None or not any(hit):
                # no match, or a degenerate all-empty match (every
                # variable took 0 rows) — either way advance one row
                i += 1
                continue
            segs = {s.name: _Seg(cols, pos) for s, pos in zip(step_list, hit)}
            if alt_masks:
                _add_alt_segs(step_list, hit, alt_masks, cols, segs)
            if gout is not None:
                _add_group_segs(step_list, gout, cols, segs)
            # ALL ROWS PER MATCH measures return one columnar chunk
            # per match; the default returns the match's single row
            if all_rows or number_matches:
                n_match += 1
                out.append(measures(key, segs, n_match))
            else:
                out.append(measures(key, segs))
            i = _resume(i, hit)
        return out

    def run_one(key: tuple, pdf: pd.DataFrame) -> list[dict[str, Any]]:
        try:
            # stable multi-key sort straight on the numpy arrays —
            # DataFrame.sort_values factorizes every key column per
            # key group, a measured ~25 % of matcher wall time
            order = np.lexsort(
                tuple(pdf[c].to_numpy() for c in reversed(list(order_cols)))
            )
            pdf = pdf.take(order).reset_index(drop=True)
        except TypeError:  # non-lexsortable dtype — pandas fallback
            pdf = pdf.sort_values(
                list(order_cols), kind="mergesort"
            ).reset_index(drop=True)
        n = len(pdf)
        masks = _group_masks(step_list, pdf)
        alt_masks = _alt_member_masks(step_list, pdf)
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        ts = (
            pdf[order_cols[0]].to_numpy("int64")
            if within_us is not None else None
        )
        return scan_core(key, n, masks, alt_masks, cols, ts)

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        out = run_one(key, pdf)
        if all_rows:
            return _assemble_all_rows(out, out_cols)
        if not out:
            return pd.DataFrame(columns=out_cols)
        return pd.DataFrame(out)

    if group_buckets is None:
        return df.groupBy(*key_cols).applyInPandas(run, schema=output_schema)

    kcols = list(key_cols)
    ocols = list(order_cols)

    def run_bucket(_key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # One stable lexsort of the WHOLE bucket by (key, order), one
        # take, one column→ndarray conversion — the per-key
        # DataFrame.take / groupby sub-frame construction was the
        # dominant constant factor with ~1.5k keys per bucket (r14
        # profile: ~40 % of matcher wall time). With every step
        # row-local (bucket_local) the static masks are additionally
        # evaluated once over the sorted bucket and SLICED per key.
        out: list = []
        n_all = len(pdf)
        fast = n_all > 0
        if fast:
            try:
                sort_arrs = [pdf[c].to_numpy() for c in kcols + ocols]
                order = np.lexsort(tuple(reversed(sort_arrs)))
            except TypeError:  # non-lexsortable dtype
                fast = False
            else:
                # pandas groupby drops null keys (dropna=True); the
                # sliced path would keep them — fall back to the
                # per-key path so semantics stay identical
                if any(pd.isna(a).any() for a in sort_arrs[: len(kcols)]):
                    fast = False
        if fast:
            pdf_s = pdf.take(order).reset_index(drop=True)
            cols_all = {c: pdf_s[c].to_numpy() for c in pdf_s.columns}
            karrs = [cols_all[c] for c in kcols]
            chg = np.zeros(n_all, dtype=bool)
            chg[0] = True
            for a in karrs:
                chg[1:] |= a[1:] != a[:-1]
            bounds = np.flatnonzero(chg).tolist()
            bounds.append(n_all)
            masks_all = _group_masks(step_list, pdf_s) if bucket_local else None
            alt_all = (
                _alt_member_masks(step_list, pdf_s) if bucket_local else None
            )
            ts_all = (
                pdf_s[ocols[0]].to_numpy("int64")
                if within_us is not None else None
            )
            for gi in range(len(bounds) - 1):
                a, b = bounds[gi], bounds[gi + 1]
                key = tuple(arr[a] for arr in karrs)
                cols = {c: v[a:b] for c, v in cols_all.items()}
                if masks_all is not None:
                    masks = [
                        [mm[a:b] for mm in m] if isinstance(m, list)
                        else m[a:b]
                        for m in masks_all
                    ]
                    alt_masks = {
                        nm: (names, choice[a:b])
                        for nm, (names, choice) in alt_all.items()
                    }
                else:
                    sub = pdf_s.iloc[a:b]
                    masks = _group_masks(step_list, sub)
                    alt_masks = _alt_member_masks(step_list, sub)
                ts = ts_all[a:b] if ts_all is not None else None
                out.extend(scan_core(key, b - a, masks, alt_masks, cols, ts))
        else:
            for kv, sub in pdf.groupby(kcols, sort=False):
                kt = kv if isinstance(kv, tuple) else (kv,)
                out.extend(run_one(kt, sub))
        if all_rows:
            return _assemble_all_rows(out, out_cols)
        if not out:
            return pd.DataFrame(columns=out_cols)
        return pd.DataFrame(out)

    bucket = F.pmod(F.xxhash64(*key_cols), F.lit(group_buckets))
    return (
        df.withColumn("__cep_bucket", bucket)
        .groupBy("__cep_bucket")
        .applyInPandas(run_bucket, schema=output_schema)
    )
