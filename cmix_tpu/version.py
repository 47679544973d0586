"""Format versioning.

The archive format is defined by the exact numeric behavior of the model
ensemble (like the reference, where the predictor IS the format:
/root/reference/src/predictor.cpp).  Any change to LUTs, table sizes, model
wiring, update rules, or the coder bumps FORMAT_VERSION.
"""

FORMAT_VERSION = 17
MAGIC = b"TCMX"
