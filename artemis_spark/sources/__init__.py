"""Sources, sinks and the versioned state store."""
