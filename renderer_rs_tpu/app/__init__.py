"""app — executable entry point (≙ crates/app)."""
