from .wire import from_json, from_wire, to_json, to_wire

__all__ = ["from_json", "from_wire", "to_json", "to_wire"]
