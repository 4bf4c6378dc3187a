from .message import MESSAGE_SCHEMA, parse_message, serialize_message

__all__ = ["MESSAGE_SCHEMA", "parse_message", "serialize_message"]
