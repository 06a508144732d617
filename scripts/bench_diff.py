#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: bench_diff.py OLD NEW [--bar RATIO ABS]

OLD/NEW are bench artifacts: either a bench_results.json array (the
file graft.Bench writes) or a BENCH_r{N}.json driver capture that
still contains a {"metric":"queries",...} line. Prints per-query
deltas for common keys, new/removed keys, and flags regressions above
the bar (default: >1.5x AND >+0.5s, the SCALE.md regression bar).

When BOTH artifacts carry a calibration reading (the constant-work
CPU probe graft.Bench emits since r14, as a {"metric":"calibration"}
line or a "calib" field on the total line), ratios are DRIFT-
CORRECTED: every new time is divided by scale = calib_new/calib_old
before comparison, so a uniformly slower box doesn't read as a
regression. Raw ratios are still printed alongside.

Composition handling (r16 ADVICE): the headline total excludes
"composed" entries since r16 (graph_e2e re-times gated cards); when
the two artifacts exclude different key sets, the adjusted-total
comparison normalizes the older total to the newer composition using
the per-query values before printing the ratio. Composed keys are
annotated in the per-query table and never exit-code-flagged (their
stages are flagged individually).

Suspect keys (r16 VERDICT #2): since r17 the contention line carries
"suspect_keys" — queries whose bench segment had an elevated
interleaved probe. These are annotated and excluded from regression
flagging (reported separately); their times carry co-located load the
calibration probe cannot correct.
Exit code 1 if any query is flagged.
"""
import json
import re
import sys


def load_queries(path):
    text = open(path).read()
    # try a JSON array of metric lines first (bench_results.json)
    try:
        arr = json.loads(text)
        if isinstance(arr, list):
            for obj in arr:
                if isinstance(obj, dict) and obj.get("metric") == "queries":
                    return obj["queries"]
        if isinstance(arr, dict) and arr.get("metric") == "queries":
            return arr["queries"]
    except json.JSONDecodeError:
        pass
    # fall back: scan for a queries line inside arbitrary captured
    # text. The emitted line ends `...,"sf":"<dir>"}` (the queries map
    # closes with `},"key_notes"`), so match that full shape rather
    # than a `}}` substring the line never contains.
    for m in re.finditer(r'\{"metric":"queries".*?"sf":"[^"]*"\}', text):
        try:
            return json.loads(m.group(0))["queries"]
        except json.JSONDecodeError:
            continue
    # last resort: harvest key:seconds pairs from a TRUNCATED driver
    # capture (BENCH_r{N}.json keeps only a tail of stdout) — partial,
    # but enough for a common-key comparison
    pairs = {m.group(1): float(m.group(2)) for m in re.finditer(
        r'\\?"((?:q_\w+|\w+_e2e|compression_ratio|mmr_rerank|pca_whiten|'
        r'unigram_train|zorder_sink))\\?":(\d+\.\d+)', text)}
    if pairs:
        print(f"note: {path} had no intact queries line; "
              f"harvested {len(pairs)} partial entries from the tail", file=sys.stderr)
        return pairs
    raise SystemExit(f"{path}: no queries metric found")


def load_metric_lines(path):
    """Every metric object found in the artifact, array or tail text."""
    text = open(path).read()
    out = []
    try:
        arr = json.loads(text)
        if isinstance(arr, list):
            return [o for o in arr if isinstance(o, dict) and "metric" in o]
    except json.JSONDecodeError:
        pass
    for m in re.finditer(r'\{"metric":"[^"]+".*?"sf":"[^"]*"\}', text):
        try:
            out.append(json.loads(m.group(0)))
        except json.JSONDecodeError:
            continue
    return out


def load_calibration(path):
    """Mean constant-work probe seconds, or None for pre-r14 artifacts."""
    text = open(path).read()
    try:
        arr = json.loads(text)
        if isinstance(arr, list):
            for obj in arr:
                if isinstance(obj, dict) and obj.get("metric") == "calibration":
                    v = float(obj.get("value", 0.0))
                    if v > 0:
                        return v
            for obj in arr:
                if isinstance(obj, dict) and obj.get("metric") == "total" \
                        and float(obj.get("calib", 0.0)) > 0:
                    return float(obj["calib"])
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric":"calibration".*?"value":(\d+\.\d+)', text)
    if m and float(m.group(1)) > 0:
        return float(m.group(1))
    m = re.search(r'"calib":(\d+\.\d+)', text)
    if m and float(m.group(1)) > 0:
        return float(m.group(1))
    return None


def load_contended(path):
    """(contended, spread) from the interleaved short-probe series
    graft.Bench emits since r16, or (None, None) for older artifacts.
    ALL occurrences are read, not just the first (r16 ADVICE — the
    compact total line goes out before the end-of-run probe lands, so
    contention arriving during the scaling/tail phase shows only in
    the final calibration line) and contended is the OR with the max
    spread: the r16 artifact itself proves either single reading can
    miss — its mid-run reading caught contention (0.255) that a clean
    final probe demoted back under the band (0.064) by shifting the
    median."""
    text = open(path).read()
    ms = re.findall(
        r'"(?:probe_)?spread":(\d+\.\d+),"contended":(true|false)', text)
    if ms:
        return any(c == "true" for _, c in ms), max(float(s) for s, _ in ms)
    return None, None


def load_suspect_keys(path):
    """suspect_keys from the contention line (since r17), else []."""
    for obj in load_metric_lines(path):
        if obj.get("metric") == "contention" and "suspect_keys" in obj:
            return set(obj["suspect_keys"])
    ms = re.findall(r'"suspect_keys":\[([^\]]*)\]', open(path).read())
    if ms:
        return set(re.findall(r'"([^"]+)"', ms[-1]))
    return set()


def load_excluded(path):
    """composed_excluded from the total line (since r16). Empty set
    for older artifacts — their totals INCLUDED the composed keys."""
    for obj in load_metric_lines(path):
        if obj.get("metric") == "total" and "composed_excluded" in obj:
            return set(obj["composed_excluded"])
    ms = re.findall(r'"composed_excluded":\[([^\]]*)\]', open(path).read())
    if ms:
        return set(re.findall(r'"([^"]+)"', ms[-1]))
    return set()


def load_calib_ref(path):
    ms = re.findall(r'"calib_ref":(\d+\.\d+)', open(path).read())
    return float(ms[-1]) if ms else None


def load_adjusted(path):
    """Drift-normalized total (emitted since r15: total x 0.973/calib
    against the fixed r14 reference probe), or None for older
    artifacts. The LAST occurrence wins — the end-of-run calibration
    line recomputes it against the mean probe."""
    text = open(path).read()
    m = re.findall(r'"total_calib_adjusted":(\d+\.\d+)', text)
    return float(m[-1]) if m else None


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    ratio_bar, abs_bar = 1.5, 0.5
    if "--bar" in sys.argv:
        i = sys.argv.index("--bar")
        ratio_bar, abs_bar = float(sys.argv[i + 1]), float(sys.argv[i + 2])
    old, new = load_queries(args[0]), load_queries(args[1])
    calib_old, calib_new = load_calibration(args[0]), load_calibration(args[1])
    scale = 1.0
    if calib_old and calib_new:
        scale = calib_new / calib_old
        print(f"calibration: old={calib_old:.3f}s new={calib_new:.3f}s "
              f"-> box speed scale {scale:.3f} (new times divided by it)")
    else:
        print("calibration: missing in one or both artifacts; raw comparison")
    suspect = set()
    for path, label in ((args[0], "old"), (args[1], "new")):
        cont, spread = load_contended(path)
        if cont:
            print(f"WARNING: {label} artifact ({path}) self-identifies as "
                  f"CONTENDED (probe spread {spread:.0%} > 15% band) - "
                  f"co-located load inflates its times beyond what "
                  f"calibration corrects; treat flagged regressions as suspect")
        keys = load_suspect_keys(path)
        if keys:
            print(f"{label} artifact marks {len(keys)} keys as suspect "
                  f"(contended segment); excluded from flagging")
            suspect |= keys
    excl_old, excl_new = load_excluded(args[0]), load_excluded(args[1])
    composed = excl_old | excl_new
    adj_old, adj_new = load_adjusted(args[0]), load_adjusted(args[1])
    if adj_old and adj_new:
        # composition normalization (r16 ADVICE): if the two totals
        # exclude different composed keys, rebuild each total on the
        # UNION exclusion set from the per-query values (same
        # calibRef/calib correction the totals themselves used)
        note = ""
        if excl_old != excl_new:
            cref = load_calib_ref(args[0]) or load_calib_ref(args[1])
            sub_old = composed - excl_old  # still inside the old total
            sub_new = composed - excl_new  # still inside the new total
            miss = [q for q in sub_old if q not in old] + \
                   [q for q in sub_new if q not in new]
            if miss or not (cref and calib_old and calib_new):
                print(f"WARNING: composed_excluded differs (old={sorted(excl_old)} "
                      f"new={sorted(excl_new)}) and the totals cannot be "
                      f"normalized (missing per-query values {miss} or "
                      f"calibration); adjusted-total ratio compares "
                      f"INCOMPATIBLE compositions - do not trust it")
            else:
                adj_old -= sum(old[q] for q in sub_old) * cref / calib_old
                adj_new -= sum(new[q] for q in sub_new) * cref / calib_new
                note = (f" [normalized to common composition: both totals "
                        f"exclude {sorted(composed)}]")
        print(f"total_calib_adjusted (fixed-reference): old={adj_old:.1f}s "
              f"new={adj_new:.1f}s ratio={adj_new / adj_old:.3f}{note}")
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    flagged = []
    suspect_regr = []
    fixed = []
    rows = []
    for q in common:
        o, n = old[q], new[q]
        # Bench records 0.0 for a query that FAILED that round — a
        # nonzero new reading is a fix, not a regression
        if o == 0.0:
            if n > 0.0:
                fixed.append(q)
            continue
        adj = n / scale
        ratio = adj / o
        over_bar = adj > o * ratio_bar and adj - o > abs_bar
        # composed entries re-time gated cards (flagged individually)
        # and change composition across rounds; suspect entries carry
        # segment-local contention — neither exit-code-flags
        if over_bar and q in suspect:
            suspect_regr.append(q)
        flag = over_bar and q not in suspect and q not in composed
        if flag:
            flagged.append(q)
        rows.append((ratio, q, o, n, flag))
    rows.sort(reverse=True)
    print(f"common={len(common)} added={len(added)} removed={len(removed)}")
    print(f"sum(common): {sum(old[q] for q in common):.1f}s -> "
          f"{sum(new[q] for q in common):.1f}s"
          + (f" (drift-corrected: {sum(new[q] for q in common) / scale:.1f}s)"
             if scale != 1.0 else ""))
    print(f"\n{'ratio*':>7} {'old':>8} {'new':>8}  query   (*drift-corrected)")
    for ratio, q, o, n, flag in rows[:25]:
        mark = "  <-- REGRESSION" if flag else ""
        if q in composed:
            mark += "  [composed; excluded from totals/flagging; " \
                    "composition may differ across rounds]"
        if q in suspect:
            mark += "  [suspect: contended segment]"
        print(f"{ratio:7.2f} {o:8.3f} {n:8.3f}  {q}{mark}")
    if fixed:
        print(f"\nfixed (failed in old round, running now): {', '.join(fixed)}")
    if added:
        print(f"\nnew keys: {', '.join(added)}")
    if removed:
        print(f"\nremoved keys: {', '.join(removed)}")
    if suspect_regr:
        print(f"\nover-bar but SUSPECT (contended segment, not flagged): "
              f"{', '.join(suspect_regr)} - re-run these in isolation "
              f"before believing the regression")
    if flagged:
        print(f"\nFLAGGED (> {ratio_bar}x and > +{abs_bar}s): {', '.join(flagged)}")
        sys.exit(1)
    print(f"\nno regression above the {ratio_bar}x/+{abs_bar}s bar")


if __name__ == "__main__":
    main()
