// Minimal boost::program_options stand-in, sufficient to compile and run the
// reference TWILIGHT binary for golden-output generation. Not a general
// library. Maps onto plain C++17.
#ifndef SHIM_BOOST_PROGRAM_OPTIONS_HPP
#define SHIM_BOOST_PROGRAM_OPTIONS_HPP

#include <cmath>
#include <climits>
#include <string>
#include <vector>
#include <map>
#include <memory>
#include <iostream>
#include <sstream>
#include <stdexcept>
#include <functional>

namespace boost {
namespace program_options {

class value_semantic {
public:
    virtual ~value_semantic() = default;
    virtual bool takes_value() const { return true; }
    virtual bool has_default() const = 0;
    virtual void parse_into(void*& storage, const std::string& tok) const = 0;
    virtual void default_into(void*& storage) const = 0;
    virtual void destroy(void* storage) const = 0;
};

template <typename T>
static T parse_token(const std::string& tok) {
    std::istringstream iss(tok);
    T v;
    iss >> v;
    if (iss.fail()) throw std::runtime_error("invalid option value: " + tok);
    return v;
}
template <>
inline std::string parse_token<std::string>(const std::string& tok) { return tok; }

template <typename T>
class typed_value : public value_semantic {
public:
    typed_value* default_value(const T& v) { def_ = std::make_shared<T>(v); return this; }
    bool has_default() const override { return def_ != nullptr; }
    void parse_into(void*& storage, const std::string& tok) const override {
        destroy(storage);
        storage = new T(parse_token<T>(tok));
    }
    void default_into(void*& storage) const override {
        destroy(storage);
        storage = new T(*def_);
    }
    void destroy(void* storage) const override { delete static_cast<T*>(storage); }
private:
    std::shared_ptr<T> def_;
};

template <typename T>
typed_value<T>* value() { return new typed_value<T>(); }

struct option_info {
    std::string long_name;
    std::string short_name;
    std::shared_ptr<value_semantic> semantic;  // null => flag
    std::string description;
};

class options_description;

class options_adder {
public:
    explicit options_adder(options_description* owner) : owner_(owner) {}
    options_adder& operator()(const char* name, const char* desc);
    options_adder& operator()(const char* name, value_semantic* sem, const char* desc);
private:
    options_description* owner_;
};

class options_description {
public:
    options_description() = default;
    explicit options_description(const std::string& caption, unsigned = 80)
        : caption_(caption) {}
    options_adder add_options() { return options_adder(this); }
    options_description& add(const options_description& other) {
        for (auto& o : other.options_) options_.push_back(o);
        return *this;
    }
    void add_option(const option_info& oi) { options_.push_back(oi); }
    const std::vector<option_info>& options() const { return options_; }
    const std::string& caption() const { return caption_; }
private:
    std::string caption_;
    std::vector<option_info> options_;
};

inline options_adder& options_adder::operator()(const char* name, const char* desc) {
    option_info oi;
    std::string n(name);
    auto comma = n.find(',');
    oi.long_name = (comma == std::string::npos) ? n : n.substr(0, comma);
    oi.short_name = (comma == std::string::npos) ? "" : n.substr(comma + 1);
    oi.semantic = nullptr;
    oi.description = desc;
    owner_->add_option(oi);
    return *this;
}
inline options_adder& options_adder::operator()(const char* name, value_semantic* sem, const char* desc) {
    option_info oi;
    std::string n(name);
    auto comma = n.find(',');
    oi.long_name = (comma == std::string::npos) ? n : n.substr(0, comma);
    oi.short_name = (comma == std::string::npos) ? "" : n.substr(comma + 1);
    oi.semantic.reset(sem);
    oi.description = desc;
    owner_->add_option(oi);
    return *this;
}

inline std::ostream& operator<<(std::ostream& os, const options_description& d) {
    os << d.caption() << ":\n";
    for (auto& o : d.options()) {
        os << "  --" << o.long_name;
        if (!o.short_name.empty()) os << ", -" << o.short_name;
        os << "\t" << o.description << "\n";
    }
    return os;
}

class variable_value {
public:
    variable_value() : storage_(nullptr), sem_(nullptr) {}
    variable_value(void* s, std::shared_ptr<value_semantic> sem) : storage_(s), sem_(sem) {}
    template <typename T>
    const T& as() const {
        if (!storage_) throw std::runtime_error("option has no value");
        return *static_cast<T*>(storage_);
    }
    void* storage_;
    std::shared_ptr<value_semantic> sem_;
};

class variables_map {
public:
    size_t count(const std::string& name) const { return vals_.count(name); }
    const variable_value& operator[](const std::string& name) const {
        static variable_value empty;
        auto it = vals_.find(name);
        return (it == vals_.end()) ? empty : it->second;
    }
    std::map<std::string, variable_value> vals_;
};

struct parsed_options {
    std::vector<std::pair<std::string, std::string>> values; // name -> token ("" for flags)
    std::vector<std::string> flags;
    const options_description* desc = nullptr;
};

class command_line_parser {
public:
    command_line_parser(int argc, char** argv) {
        for (int i = 1; i < argc; ++i) args_.push_back(argv[i]);
    }
    command_line_parser& options(const options_description& d) { desc_ = &d; return *this; }
    parsed_options run() {
        parsed_options result;
        result.desc = desc_;
        auto find_long = [&](const std::string& n) -> const option_info* {
            for (auto& o : desc_->options()) if (o.long_name == n) return &o;
            return nullptr;
        };
        auto find_short = [&](const std::string& n) -> const option_info* {
            for (auto& o : desc_->options()) if (o.short_name == n) return &o;
            return nullptr;
        };
        for (size_t i = 0; i < args_.size(); ++i) {
            std::string a = args_[i];
            const option_info* oi = nullptr;
            std::string inline_val;
            bool has_inline = false;
            if (a.rfind("--", 0) == 0) {
                std::string body = a.substr(2);
                auto eq = body.find('=');
                if (eq != std::string::npos) {
                    inline_val = body.substr(eq + 1);
                    has_inline = true;
                    body = body.substr(0, eq);
                }
                oi = find_long(body);
                if (!oi) throw std::runtime_error("unrecognised option '" + a + "'");
            } else if (a.size() >= 2 && a[0] == '-' && a != "-") {
                std::string body = a.substr(1);
                oi = find_short(body);
                if (!oi) throw std::runtime_error("unrecognised option '" + a + "'");
            } else {
                throw std::runtime_error("unexpected positional argument '" + a + "'");
            }
            if (oi->semantic) {
                std::string tok;
                if (has_inline) tok = inline_val;
                else {
                    if (i + 1 >= args_.size())
                        throw std::runtime_error("option '--" + oi->long_name + "' requires a value");
                    tok = args_[++i];
                }
                result.values.push_back({oi->long_name, tok});
            } else {
                result.flags.push_back(oi->long_name);
            }
        }
        return result;
    }
private:
    std::vector<std::string> args_;
    const options_description* desc_ = nullptr;
};

inline void store(const parsed_options& parsed, variables_map& vm) {
    // Explicit values/flags.
    for (auto& f : parsed.flags) vm.vals_[f] = variable_value(nullptr, nullptr);
    for (auto& kv : parsed.values) {
        for (auto& o : parsed.desc->options()) {
            if (o.long_name == kv.first) {
                void* storage = nullptr;
                o.semantic->parse_into(storage, kv.second);
                vm.vals_[kv.first] = variable_value(storage, o.semantic);
                break;
            }
        }
    }
    // Defaults for unset options.
    for (auto& o : parsed.desc->options()) {
        if (o.semantic && o.semantic->has_default() && !vm.count(o.long_name)) {
            void* storage = nullptr;
            o.semantic->default_into(storage);
            vm.vals_[o.long_name] = variable_value(storage, o.semantic);
        }
    }
}

inline void notify(variables_map&) {}

} // namespace program_options
} // namespace boost

#endif
