"""Demo apps (reference zenith-sandbox)."""
