"""DataFrame-to-DataFrame operators (the engine's verbs)."""
