"""Format versioning.

The archive format is defined by the exact numeric behavior of the model
ensemble (like the reference, where the predictor IS the format:
/root/reference/src/predictor.cpp).  Any change to LUTs, table sizes, model
wiring, update rules, or the coder bumps FORMAT_VERSION.
"""

# v18 (round 4): CMIX_N_IND default 4->8, CTX3 0->1, new MIX2X=1, the
# RUNX_N width constant became a gate defaulting to 64 (was a fixed 16),
# and the JPEGX bank-context set grew 6->8.  gates_blob records only
# non-default gates, so a defaults flip re-keys the meaning of an absent
# gate -- every such flip MUST bump the version (decode refuses version
# mismatch, making the incompatibility loud instead of a silent desync).
FORMAT_VERSION = 18
MAGIC = b"TCMX"
