"""Sources & sinks: battlelog JSON ingest/flatten, REST fetch layer,
blacklist JSON state."""
