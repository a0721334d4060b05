"""Stage-level profile of the flagship overlay worker loop (no Spark).

Reproduces exactly what one mapInPandas batch does in overlay_rows:
  (a) job assembly from the pandas batch (per-row np.stack loop)
  (b) overlay_batch kernel (the 99 us/job core)
  (c) per-ring emission (tolist + list appends)
  (d) pandas DataFrame construction
  (e) Arrow conversion of the output (what Spark does on yield)

Jobs are the bench flagship's shape: L-hexagon subject vs shifted-rect clip,
three rules per job, derived from synthetic int ids like the sf0.1 lineitem key.
"""
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")
from ioverlay_spark.kernel.batch import overlay_batch
from ioverlay_spark.options import DEFAULT_OPTIONS, FillRule, OverlayRule

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
rng = np.random.default_rng(7)
ids = rng.integers(1, 6_000_000, size=N).astype(np.int64)

# mirror rect_exprs/_hex_pts/_clip_rect_exprs arithmetic in numpy
x1 = (ids % 10_000) * 100
y1 = ((ids // 7) % 10_000) * 100
x2 = x1 + 400 + (ids % 37) * 8
y2 = y1 + 400 + (ids % 29) * 8
xm = x1 + ((x2 - x1) >> 1)
ym = y1 + ((y2 - y1) >> 1)
subj_x = np.stack([x1, x2, x2, xm, xm, x1], axis=1)
subj_y = np.stack([y1, y1, ym, ym, y2, y2], axis=1)
cx1 = x1 + 150
cy1 = y1 + 150
cx2 = x2 + 150
cy2 = y2 + 150
clip_x = np.stack([cx1, cx2, cx2, cx1], axis=1)
clip_y = np.stack([cy1, cy1, cy2, cy2], axis=1)

pdf = pd.DataFrame(
    {
        "pair_id": ids,
        "subj_x": list(subj_x),
        "subj_y": list(subj_y),
        "clip_x": list(clip_x),
        "clip_y": list(clip_y),
    }
)
rule_objs = [OverlayRule("intersect"), OverlayRule("union"), OverlayRule("xor")]
fr = FillRule.EVEN_ODD

t0 = time.perf_counter()
pids = pdf["pair_id"].to_numpy()
jobs = [
    (
        [np.stack([np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)], axis=1)],
        [np.stack([np.asarray(c, dtype=np.int64), np.asarray(d, dtype=np.int64)], axis=1)],
    )
    for a, b, c, d in zip(pdf["subj_x"], pdf["subj_y"], pdf["clip_x"], pdf["clip_y"])
]
t1 = time.perf_counter()
res = overlay_batch(jobs, rule_objs, fr, DEFAULT_OPTIONS, with_areas=True)
t2 = time.perf_counter()
op, orr, osid, ocid, ox, oy, oa = [], [], [], [], [], [], []
for pid, r in zip(pids, res):
    for rule in rule_objs:
        shapes, areas = r[rule]
        for sid, (shape, s_areas) in enumerate(zip(shapes, areas)):
            for cid, (ring, a2) in enumerate(zip(shape, s_areas)):
                op.append(int(pid))
                orr.append(rule.value)
                osid.append(sid)
                ocid.append(cid)
                ox.append(ring[:, 0].tolist())
                oy.append(ring[:, 1].tolist())
                oa.append(a2)
t3 = time.perf_counter()
out = pd.DataFrame(
    {
        "pair_id": pd.Series(op, dtype="int64"),
        "rule": pd.Series(orr, dtype="object"),
        "shape_id": pd.Series(osid, dtype="int64"),
        "contour_idx": pd.Series(ocid, dtype="int32"),
        "pts_x": pd.Series(ox, dtype="object"),
        "pts_y": pd.Series(oy, dtype="object"),
        "area2": pd.Series(oa, dtype="int64"),
    }
)
t4 = time.perf_counter()
tbl = pa.Table.from_pandas(out, preserve_index=False)
t5 = time.perf_counter()

print(f"jobs={N} out_rings={len(out)}")
print(f"(a) assembly   {t1-t0:7.3f} s  {(t1-t0)/N*1e6:6.1f} us/job")
print(f"(b) kernel     {t2-t1:7.3f} s  {(t2-t1)/N*1e6:6.1f} us/job (3 rules)")
print(f"(c) emission   {t3-t2:7.3f} s  {(t3-t2)/N*1e6:6.1f} us/job")
print(f"(d) pandas     {t4-t3:7.3f} s  {(t4-t3)/N*1e6:6.1f} us/job")
print(f"(e) arrow      {t5-t4:7.3f} s  {(t5-t4)/N*1e6:6.1f} us/job")
print(f"total          {t5-t0:7.3f} s  {(t5-t0)/N*1e6:6.1f} us/job")
