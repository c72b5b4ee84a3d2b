"""Pipeline plans: declarative spec → DataFrame plan → sinks."""
