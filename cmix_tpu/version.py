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
# v19 (round 5): PPM_CK 0->1 and PPM_DEEP 0->1 (checksummed PPM rows +
# order-32/48 window hashes), BANK_CH 1->3 (confidence-weighted and
# centered-confidence bank channels), CTX4 0->1 (stem-cross/class-mask
# o8/distance/word-bigram/folded-o4/vowel-shape/tag-x-word/bracket-x-
# word width tier).  (lstm_horizon stays 8: WIN=4 wins at 100 KB but
# costs +1.2% at 1 MiB B=1, r5 D1/Db2 -- and it is header-carried per
# archive anyway, not gate-keyed.)
# Measured: text100k 0.7148 -> 0.7087, exe 2.0041 -> 1.9855, dict
# 2.4431 -> 2.4283 (r5 Cz3/Cz4).
FORMAT_VERSION = 19
MAGIC = b"TCMX"
