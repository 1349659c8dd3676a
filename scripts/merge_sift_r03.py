"""Merge the round-3 SIFT artifacts into SIFT_r03.json.

The 1M run's FLAT rows are authoritative. Its DiskANN row was built before
the IP-graph-construction fix (similarity-space alpha-prune collapsed
out-degree; see commit 'Fix IP graph construction') and measured 0.001 —
the fixed build at 1M costs ~5h through the dev tunnel, so the DiskANN
evidence is re-recorded at 250k with the fixed code and labeled as such.
"""

import json
from pathlib import Path

root = Path(__file__).resolve().parent.parent
main = json.loads((root / "SIFT_r03.json").read_text())
small = json.loads((root / "SIFT_r03_diskann250k.json").read_text())

merged = dict(main)
merged["configs"] = dict(main["configs"])
merged["configs"].pop("DISKANN-IP", None)
d = dict(small["configs"]["DISKANN-IP"])
d["n"] = small["n"]
d["note"] = (
    "re-recorded at 250k rows after the IP graph-construction fix "
    "(the 1M build predated it and measured 0.001; a fixed 1M rebuild "
    "costs ~5h through the dev tunnel)"
)
merged["configs"]["DISKANN-IP"] = d
merged["flat_rows_n"] = main["n"]
(root / "SIFT_r03.json").write_text(json.dumps(merged, indent=2) + "\n")
print(json.dumps(merged, indent=2))
