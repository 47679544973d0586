"""Format versioning.

The archive format is defined by the exact numeric behavior of the model
ensemble (like the reference, where the predictor IS the format:
/root/reference/src/predictor.cpp).  Any change to LUTs, table sizes, model
wiring, update rules, or the coder bumps FORMAT_VERSION.
"""

# v18: RUNX default flipped 0->1 (round 4).  gates_blob records only
# non-default gates, so a defaults flip re-keys the meaning of an absent
# gate -- every such flip MUST bump the version (decode refuses version
# mismatch, making the incompatibility loud instead of a silent desync).
FORMAT_VERSION = 18
MAGIC = b"TCMX"
