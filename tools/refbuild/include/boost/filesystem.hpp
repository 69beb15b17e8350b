// Minimal boost::filesystem stand-in over std::filesystem, sufficient for the
// reference TWILIGHT binary (golden-output generation only).
#ifndef SHIM_BOOST_FILESYSTEM_HPP
#define SHIM_BOOST_FILESYSTEM_HPP

#include <filesystem>
#include <system_error>
#include <string>

namespace boost {
namespace system {
using error_code = std::error_code;
} // namespace system

namespace filesystem {

class path {
public:
    path() = default;
    path(const std::string& s) : p_(s) {}
    path(const char* s) : p_(s) {}
    path(const std::filesystem::path& p) : p_(p) {}
    std::string string() const { return p_.string(); }
    path parent_path() const { return path(p_.parent_path()); }
    path stem() const { return path(p_.stem()); }
    path filename() const { return path(p_.filename()); }
    const std::filesystem::path& std_path() const { return p_; }
private:
    std::filesystem::path p_;
};

inline bool exists(const std::string& s) { return std::filesystem::exists(s); }
inline bool exists(const path& p) { return std::filesystem::exists(p.std_path()); }
inline bool remove(const std::string& s) { return std::filesystem::remove(s); }
inline bool remove(const path& p) { return std::filesystem::remove(p.std_path()); }
inline std::uintmax_t remove_all(const std::string& s) {
    std::error_code ec;
    return std::filesystem::remove_all(s, ec);
}
inline std::uintmax_t remove_all(const path& p) {
    std::error_code ec;
    return std::filesystem::remove_all(p.std_path(), ec);
}
inline bool create_directories(const std::string& s) { return std::filesystem::create_directories(s); }
inline bool create_directories(const path& p) { return std::filesystem::create_directories(p.std_path()); }

class directory_entry {
public:
    directory_entry() = default;
    directory_entry(const std::filesystem::directory_entry& e) : e_(e) {}
    filesystem::path path() const { return filesystem::path(e_.path()); }
    const std::filesystem::directory_entry& std_entry() const { return e_; }
private:
    std::filesystem::directory_entry e_;
};

inline bool is_directory(const path& p) { return std::filesystem::is_directory(p.std_path()); }

class directory_iterator {
public:
    directory_iterator() = default;
    explicit directory_iterator(const std::string& s) : it_(s) {}
    explicit directory_iterator(const path& p) : it_(p.std_path()) {}
    directory_entry operator*() const { return directory_entry(*it_); }
    directory_iterator& operator++() { ++it_; return *this; }
    bool operator!=(const directory_iterator& o) const { return it_ != o.it_; }
    bool operator==(const directory_iterator& o) const { return it_ == o.it_; }
private:
    std::filesystem::directory_iterator it_;
};
inline directory_iterator begin(directory_iterator it) { return it; }
inline directory_iterator end(directory_iterator) { return directory_iterator(); }

class recursive_directory_iterator {
public:
    recursive_directory_iterator() = default;
    recursive_directory_iterator(const path& p, boost::system::error_code& ec)
        : it_(p.std_path(), ec) {}
    struct proxy {
        std::filesystem::directory_entry e;
        filesystem::path path() const { return filesystem::path(e.path()); }
        const proxy* operator->() const { return this; }
    };
    proxy operator->() const { return proxy{*it_}; }
    proxy operator*() const { return proxy{*it_}; }
    void increment(boost::system::error_code& ec) { it_.increment(ec); }
    void pop() { it_.pop(); }
    bool operator!=(const recursive_directory_iterator& o) const { return it_ != o.it_; }
    bool operator==(const recursive_directory_iterator& o) const { return it_ == o.it_; }
private:
    std::filesystem::recursive_directory_iterator it_;
};

} // namespace filesystem
} // namespace boost

#endif
