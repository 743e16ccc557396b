"""External-inference operators (SURVEY §2.10 U1/U2)."""
