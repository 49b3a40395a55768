"""Source connectors: CSV with schema auto-detection, Alpha Vantage / Yahoo
Finance payload parsers, and a generic HTTP fetch with retry/backoff."""
