"""Global constants.

Parity notes: mirrors the reference constants (reference: src/sopro/constants.py:3-5).
"""

TARGET_SR = 24000
DEFAULT_MIMI_ID = "kyutai/mimi"
