"""External integrations (reference: internal/mqtt, internal/birdweather,
internal/weather, internal/notification, internal/alerting)."""
