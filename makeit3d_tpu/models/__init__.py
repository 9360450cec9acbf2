from .field import HashGridField, VanillaField, make_field
