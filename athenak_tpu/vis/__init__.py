"""Post-processing readers (parity with reference vis/python tools)."""
