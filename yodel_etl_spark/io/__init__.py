"""Sources and sinks (SURVEY §2.1 S1-S6, §2.11 K1-K4)."""
