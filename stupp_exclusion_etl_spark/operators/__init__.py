"""Composable DataFrame operators (the engine's operator inventory)."""
